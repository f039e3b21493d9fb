package graft.sources

import graft.SparkSpec

/** S1: the CSV staging reader must land every column as a nullable string,
  * preserving dirty values verbatim for the cleaning layer. */
class SourcesSpec extends SparkSpec {

  test("csvStaging reads headers, keeps all columns string, preserves dirty values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val csv = dir.resolve("stg_customers.csv")
    java.nio.file.Files.writeString(csv,
      """customerid,customername,country,signupdate
        |42,"  alice SMITH  ",gERMANY,2020-01-31
        |,noid,France,not-a-date
        |7,"comma, name",,
        |""".stripMargin)
    val df = Sources.csvStaging(spark, csv.toString,
      Seq("customerid", "customername", "country", "signupdate"))
    assert(df.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.StringType && f.nullable))
    val rows = df.collect().map(r => (0 to 3).map(i => Option(r.getString(i))))
    assert(rows.length === 3)
    assert(rows(0) === Seq(Some("42"), Some("  alice SMITH  "), Some("gERMANY"), Some("2020-01-31")))
    assert(rows(1) === Seq(None, Some("noid"), Some("France"), Some("not-a-date")))
    assert(rows(2) === Seq(Some("7"), Some("comma, name"), None, None))

    // and the cleaning layer consumes it directly
    val cleaned = graft.etl.Transforms.customersBase(df)
    assert(cleaned.count() === 2) // blank-id row dropped
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
