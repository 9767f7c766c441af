package graft

import org.scalatest.funsuite.AnyFunSuite

/** dev/gates.json (the machine-readable gate registry emitted by
  * dev/gen_gates.py) must stay 1:1 with SparkEntry.queries — a gate
  * added without regenerating the registry, or a registry entry whose
  * gate was renamed away, fails here. The registry is how the driver,
  * the judge, and dev/compare_gates.py cross-check gate<->op<->spec
  * <->oracle coverage without reading prose. */
class GateRegistrySpec extends AnyFunSuite {

  private def registry: (Set[String], Set[String], String) = {
    val p = java.nio.file.Paths.get("dev/gates.json")
    assert(java.nio.file.Files.exists(p),
      s"dev/gates.json missing — run python3 dev/gen_gates.py (cwd ${
        System.getProperty("user.dir")})")
    val txt = java.nio.file.Files.readString(p)
    val gateKey = """(?m)^    "(q\w+)": \{""".r
    val keys = gateKey.findAllMatchIn(txt).map(_.group(1)).toSet
    val missing = """"missing_oracle": \[([^\]]*)\]""".r
      .findFirstMatchIn(txt).map(_.group(1).trim).getOrElse("")
    val missingSet = """"(q\w+)"""".r.findAllMatchIn(missing)
      .map(_.group(1)).toSet
    (keys, missingSet, txt)
  }

  test("registry gates == SparkEntry.queries, exactly") {
    val (keys, _, _) = registry
    val live = SparkEntry.queries.keySet
    val stale = keys -- live
    val unregistered = live -- keys
    assert(stale.isEmpty && unregistered.isEmpty,
      s"regenerate dev/gates.json (python3 dev/gen_gates.py): " +
        s"stale=${stale.toSeq.sorted.take(5)} " +
        s"unregistered=${unregistered.toSeq.sorted.take(5)}")
  }

  test("every gate has an oracle (none degrade to rows-only checks)") {
    val (_, missingOracle, _) = registry
    assert(missingOracle.isEmpty,
      s"gates without oracleSql: ${missingOracle.toSeq.sorted}")
    val live = SparkEntry.oracleSql.keySet
    val q = SparkEntry.queries.keySet
    assert((q -- live).isEmpty,
      s"queries with no oracleSql entry at runtime: ${(q -- live).toSeq.sorted}")
  }

  test("registry records an oracle line and at least one op per gate") {
    val (_, _, txt) = registry
    // every gate object carries query_line, ops and oracle_line fields
    val gateBlocks = """(?s)    "(q\w+)": \{(.*?)\n    \}""".r
    val bad = gateBlocks.findAllMatchIn(txt).collect {
      case m if !m.group(2).contains("\"oracle_line\"") ||
        !m.group(2).contains("\"ops\"") => m.group(1)
    }.toSeq
    assert(bad.isEmpty, s"registry entries missing fields: ${bad.take(5)}")
  }
}
