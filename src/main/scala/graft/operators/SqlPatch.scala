package graft.operators

/** Asserted textual surgery for composed oracle SQL. Several oracles
  * derive from a base query's text via `.replace` (rescore widens
  * searchRanked's window, the quality/dup-weighted canonical oracles
  * extend canonicalCorpusSql's final SELECT). A plain `.replace` whose
  * needle has drifted out of the base text is a silent no-op — the
  * oracle then checks the WRONG query and the hash mismatch points at
  * the operator instead of the harness. Every patch therefore requires
  * the needle to be present (and, for non-identity patches, that the
  * output actually changed), failing fast at composition time.
  */
private[graft] object SqlPatch {
  def apply(base: String, needle: String, replacement: String): String = {
    require(base.contains(needle),
      s"SqlPatch: needle not found in base SQL (drifted?): ${needle.take(80)}")
    base.replace(needle, replacement)
  }
}
