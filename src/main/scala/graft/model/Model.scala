package graft.model

/** Core engine data model (FIXTURES.md §1-2, BASELINE.json input_hint).
  *
  * `ChangeEvent` is the WAL row: the analogue of the reference's
  * lookback-scanned source rows carrying `updt_dt_tm`
  * (/root/reference/Delphi/MSSQL_Vertica_Translations/README.md:11-17),
  * with the wall-clock replaced by a strictly-increasing `seq` so replay
  * is exact rather than window-approximate.
  */
final case class ChangeEvent(
    seq: Long,            // strictly increasing, total order (the WAL offset)
    epoch: Long,          // micro-batch id: seq / epochSize
    op: String,           // I / U / D (U on absent key = insert: MERGE semantics)
    repo: String,         // identity_context analogue (mosaiq_person.sql:2-12)
    path: String,         // source_pk analogue; (repo,path) = business key
    commit: String,       // change version; (repo,path,commit) = idempotency key
    lang: String,         // low-cardinality dim (concept-lookup analogue)
    content: String,      // payload; invariant = sha256(content) equality
    schemaVersion: Int    // bumps at schema-evolution points
)

/** A row of the merged target table (pre-evolution columns). */
final case class RepoState(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    content_sha: String,
    updated_seq: Long
)
