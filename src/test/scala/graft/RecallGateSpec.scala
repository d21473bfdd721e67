package graft

import org.scalatest.funsuite.AnyFunSuite

class RecallGateSpec extends AnyFunSuite {

  test("spec parser: bare names, '+'-separated dials, and the ','-list boundary") {
    assert(RecallGate.parseSpec("refined") === ("refined", Map.empty))
    assert(RecallGate.parseSpec("refined@kd=48") ===
      ("refined", Map("kd" -> 48L)))
    // dials are '+'-separated because ',' separates the SPEC LIST in the
    // env var — the original ','-dial syntax silently split one tuned
    // spec into several bogus specs (an r13 sweep ran the wrong config
    // for 35 minutes before this was caught)
    assert(RecallGate.parseSpec("refined@kd=48+tables=8+target=256") ===
      ("refined", Map("kd" -> 48L, "tables" -> 8L, "target" -> 256L)))
    assert(RecallGate.parseSpec("refined@rounds=7") ===
      ("refined", Map("rounds" -> 7L)))
  }
}
