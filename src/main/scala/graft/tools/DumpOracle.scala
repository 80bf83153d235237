package graft.tools
import java.nio.file.{Files, Paths}

/** Dev tool: dump SparkEntry.oracleSql as JSON WITHOUT running any query —
  * lets the dtype-strict comparator audit oracle output types (HUGEINT /
  * DECIMAL columns that the driver's hash reads as float64) before a full
  * Verify pass. Usage: runMain graft.tools.DumpOracle /tmp/oracle_sql.json */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle entries to $out")
  }
}
