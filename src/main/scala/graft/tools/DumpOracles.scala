package graft.tools

/** Write `SparkEntry.oracleSql` as oracle_sql.json without running any
  * query — lets the two oracle checkers re-run against an existing
  * Verify dump whose JVM died between the last dump and the final
  * write (observed once on this shared VM), and gives oracle-only
  * edits a fast local loop. Usage: runMain graft.tools.DumpOracles <path> */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)),
      graft.Verify.oracleJson(graft.SparkEntry.oracleSql, Set.empty))
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracles to ${args(0)}")
  }
}
