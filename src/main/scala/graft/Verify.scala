package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: <sfDir> <outDir>; extra args (builder-side only)
    // restrict the dump to the named queries for fast iteration
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A failing query must produce a RED gate row, never an absent one
    // (VERDICT r9 #3: 9 broken queries silently vanished from the compare).
    // On failure we write a zero-row marker parquet whose lone column
    // `_verify_error` matches no oracle schema and no rows-only check, so
    // every registered query yields exactly one — red or green — row.
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        failures += name -> msg
        System.err.println(s"[verify] $name FAILED: $msg")
        spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("_verify_error",
                org.apache.spark.sql.types.StringType))))
          .write.mode("overwrite").parquet(s"$outDir/$name")
      }
    }
    // Gate-shrink assertion: every selected query must have produced a dump.
    val written = selected.keySet.filter(n => Files.exists(Paths.get(s"$outDir/$n")))
    val absent = selected.keySet -- written
    System.err.println(
      s"[verify] dumped ${written.size}/${selected.size} queries" +
        (if (failures.nonEmpty)
          s"; ${failures.size} FAILED (marker rows written): " +
            failures.map(_._1).toSeq.sorted.mkString(", ")
        else "") +
        (if (absent.nonEmpty)
          s"; ${absent.size} ABSENT — the gate would shrink: " +
            absent.toSeq.sorted.mkString(", ")
        else ""))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
