package graft.sources

/** The JDBC erasure-ledger naming seam, defined ONCE (round-18
  * directive #4). The convention — an erasure request against master
  * table `M` lands its suppression ledger as table `M_suppress` in the
  * same engine — is load-bearing on BOTH sides of the batch/stream
  * seam: etl31 ([[graft.operators.Etl.etl31JdbcErasure]]) writes the
  * ledger under this name, and the streaming merge sink
  * ([[graft.streaming.GraftStreams.upsertBatchToJdbc]]) auto-detects
  * it and gates every staged micro-batch in the same transaction as
  * its MERGE. Before this object each side spelled the suffix
  * literally, so a drifted spelling on either side would silently
  * UN-gate the stream (the exists-probe just misses, and erased keys
  * resurrect on replay). One definition makes that drift a compile
  * error instead of a silent privacy hole; the near-miss spec arm
  * (ledger under a wrong name must NOT gate — and legitimate rows
  * still land) pins the failure mode itself.
  */
object JdbcErasure {

  /** The ledger table name the seam probes for beside `master`. */
  def suppressTableFor(master: String): String = s"${master}_suppress"
}
