package graft

/** Driver-contract smoke tests: the external harness only checks these
  * at round boundaries, so regressions here would otherwise surface a
  * full round late. */
class SparkEntrySpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("no registry silently shadows another's query name") {
    val names = SparkEntry.registries.flatMap(_.queries.keys)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names across registries: $dupes")
    assert(names.size === SparkEntry.queries.size)
    // same for the oracle maps: a duplicated oracle key would make the
    // driver verify the surviving query against the wrong SQL
    val oracleNames = SparkEntry.registries.flatMap(_.oracle.keys)
    val oracleDupes = oracleNames.groupBy(identity).filter(_._2.size > 1).keys
    assert(oracleDupes.isEmpty, s"duplicate oracle keys: $oracleDupes")
    assert(oracleNames.size === SparkEntry.oracleSql.size)
  }
}
