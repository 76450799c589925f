package graft.plans

/** Write-audit-publish (the Iceberg WAP pattern): stage commits so
  * readers of MAIN never see them, audit the staged snapshot through
  * the normal read path, then publish by fast-forwarding main — all
  * three steps are metadata pointer moves over the existing versioned
  * manifests, no data ever rewritten or copied.
  *
  * Staging works because [[TableIO.rollback]] PRESERVES history: the
  * staged version's manifest stays on disk and readable (tagged for
  * discoverability), while main's current version equals the
  * pre-stage state.
  */
object Wap {

  /** Run `body` (any sequence of commits), tag the resulting snapshot
    * `audit-v<N>`, and move main back to where it was. Returns the
    * staged (auditable) version. Readers of main see no change;
    * auditors read the staged version via [[Mor.readAt]] or the tag.
    */
  def stage(root: String, ns: String, table: String)(body: => Unit): Long = {
    val v0 = TableIO.currentVersion(root, ns, table)
    body
    val staged = TableIO.currentVersion(root, ns, table)
    require(staged > v0, "stage body committed nothing")
    TableIO.setRef(root, ns, table, s"audit-v$staged", "tag", staged)
    TableIO.rollback(root, ns, table, v0)
    staged
  }

  /** Publish an audited staging: fast-forward main to it (a rollback
    * TO the staged version — the same metadata move). The audit tag
    * is dropped once published.
    */
  def publish(root: String, ns: String, table: String,
      stagedVersion: Long): Long = {
    val v = TableIO.rollback(root, ns, table, stagedVersion)
    TableIO.dropRef(root, ns, table, s"audit-v$stagedVersion")
    v
  }

  /** Reject a staging: just drop the tag — main never saw it, and the
    * staged files become removable debris for snapshot expiry.
    */
  def reject(root: String, ns: String, table: String,
      stagedVersion: Long): Unit =
    TableIO.dropRef(root, ns, table, s"audit-v$stagedVersion")
}
