package graft

import org.scalatest.funsuite.AnyFunSuite

/** The one-line entry point wires extensions + confs correctly. Uses
  * the shared session's JVM: getOrCreate returns the active session
  * but still applies extensions at first creation — so assert against
  * a cloned builder config instead of forcing a second context. */
class GraftSessionSpec extends AnyFunSuite {

  test("Graft.session exposes the native SQL functions and pinned confs") {
    val s = Graft.session(master = "local[2]", shufflePartitions = Some(2))
    try {
      assert(s.sql("SELECT graft_dot(array(1.0d,2.0d), array(3.0d,4.0d))")
        .head().getDouble(0) === 11.0)
      assert(s.sql("SELECT graft_shingles('a b c', 2)")
        .head().getSeq[String](0) === Seq("a b", "b c"))
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
      assert(s.conf.get("spark.sql.adaptive.enabled") === "true")
    } finally {
      // leave the shared session for other suites; nothing to stop if
      // getOrCreate reused it
    }
  }
}
