package graft

import org.apache.spark.sql.functions._

/** S4 delimited-file ingest: UTF-8 pipe CSV (DuckDB-oracled in the driver
  * run) and the UTF-16LE encoding knob (not expressible in DuckDB 1.0 —
  * verified here against pinned fixture content instead). Fixtures mirror
  * the reference's seeds: OMOP_CARESITE_FROM_EDW.csv and the MSSQL bcp
  * UTF-16 extracts (/root/reference/Delphi/step_03_location.py:97-118). */
class CsvSourceSpec extends SparkSpec {

  test("UTF-8 pipe CSV: header, quoted delimiter, empty->NULL") {
    val df = SparkEntry.queries("s4_csv_source")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 10)
    val byId = rows.map(r => r.getInt(0) -> r).toMap
    assert(byId(3).getString(1) == "Oncology Center, East") // quoted comma
    assert(byId(9).isNullAt(1), "empty care_site_name must read as NULL")
    assert(byId(4).isNullAt(3), "empty location_id must read as NULL")
    assert(byId(1).getString(4) == "CS-0001")
  }

  test("UTF-16LE pipe CSV decodes through the encoding option") {
    // UTF-16 needs multiLine mode: the non-multiline path splits lines
    // bytewise on 0x0A before decoding, shredding 2-byte code units
    val df = spark.read
      .option("sep", "|").option("header", "true")
      .option("encoding", "UTF-16").option("multiLine", "true")
      .csv("/root/repo/fixtures/location_utf16.csv")
    val rows = df.collect()
    assert(rows.length == 5)
    val cities = df.select("address_1").collect().map(r =>
      Option(r.getString(0)).getOrElse("")).toSet
    assert(cities.contains("1200 Cañón Rd"), s"got $cities")
    assert(cities.contains("15 Über Straße"))
    assert(cities.contains("9 Piñon Way"))
  }
}
