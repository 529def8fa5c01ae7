package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-family 2× bench regression gate (Bench.familyGate) and its
  * prior-file parse — pure functions, driven with synthetic slowdowns
  * so the gate's firing conditions are pinned without running Spark. */
class BenchGateSpec extends AnyFunSuite {

  test("a synthetic 2x family slowdown at equal query count FIRES") {
    val prior = Map("text" -> (40, 30.0), "dedup" -> (20, 25.0))
    val cur = Map("text" -> (40, 70.0), "dedup" -> (20, 26.0))
    assert(Bench.familyGate(cur, prior) === Seq("text"))
  }

  test("unequal query counts never flag — added queries move the " +
    "budget, they do not breach it") {
    val prior = Map("text" -> (40, 30.0))
    val cur = Map("text" -> (45, 70.0))
    assert(Bench.familyGate(cur, prior).isEmpty)
  }

  test("the +1s absolute floor keeps tiny families from flagging " +
    "on jitter") {
    val prior = Map("multimodal" -> (10, 0.4))
    val cur = Map("multimodal" -> (10, 1.1)) // >2x but delta < 1s
    assert(Bench.familyGate(cur, prior).isEmpty)
    val cur2 = Map("multimodal" -> (10, 1.5)) // >2x AND delta > 1s
    assert(Bench.familyGate(cur2, prior) === Seq("multimodal"))
  }

  test("missing prior family / zero prior seconds never flag; " +
    "multiple breaches sort") {
    val prior = Map("a" -> (5, 10.0), "b" -> (5, 0.0), "c" -> (5, 4.0))
    val cur = Map("a" -> (5, 25.0), "b" -> (5, 9.0), "c" -> (5, 11.0),
      "new" -> (3, 99.0))
    assert(Bench.familyGate(cur, prior) === Seq("a", "c"))
  }

  test("parseFamilies round-trips the bench.json families object and " +
    "drops malformed entries individually") {
    val txt = """{"metric":"total","value":1.0,"queries":{"q1":0.5},""" +
      """"families":{"text":{"n":40,"sec":30.25},""" +
      """"dedup":{"n":20,"sec":oops},"impute":{"n":7,"sec":2.5}},"sf":"x"}"""
    val fams = Bench.parseFamilies(txt)
    assert(fams === Map("text" -> (40, 30.25), "impute" -> (7, 2.5)))
    assert(Bench.parseFamilies("{}").isEmpty)
    assert(Bench.parseFamilies("no json at all").isEmpty)
  }
}
