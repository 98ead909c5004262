package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CleanseSpec extends SparkTestBase {
  import spark.implicits._

  test("F1: epoch millis string -> datetime, null -> sentinel") {
    val df = Seq(Some("1648300465000"), None, Some("0")).toDF("ts")
      .select(Cleanse.epochMillisToDateTime($"ts").as("t"))
    assert(df.as[String].collect().toSeq ==
      Seq("2022-03-26 13:14:25", "1970-01-01 00:00:00", "1970-01-01 00:00:00"))
  }

  test("F1: non-numeric input -> sentinel (cast-null path)") {
    val df = Seq("not-a-number").toDF("ts")
      .select(Cleanse.epochMillisToDateTime($"ts").as("t"))
    assert(df.as[String].head() == "1970-01-01 00:00:00")
  }

  test("F2: epoch millis -> date with sentinel") {
    val df = Seq(Some("1655274222161"), None).toDF("ts")
      .select(Cleanse.epochMillisToDate($"ts").as("t"))
    assert(df.as[String].collect().toSeq == Seq("2022-06-15", "1970-01-01"))
  }

  test("F4/F6: null-or-empty guard and date part") {
    val df = Seq(("", "2022-03-08 12:03:06"), (null, "2022-01-01 00:00:00"))
      .toDF("s", "dt")
      .select(Cleanse.isNullOrEmpty($"s").as("e"), Cleanse.datePart($"dt").as("d"))
    assert(df.as[(Boolean, String)].collect().toSeq ==
      Seq((true, "2022-03-08"), (true, "2022-01-01")))
  }

  test("F7/F9: composite key and payload map access") {
    val df = Seq((Map("k" -> "v", "logTime" -> "123"), "a", "b"))
      .toDF("m", "x", "y")
      .select(Cleanse.payload($"m", "logTime").as("p"),
        Cleanse.compositeKey($"x", $"y").as("ck"))
    assert(df.as[(String, String)].head() == ("123", "a$b"))
  }

  test("P8: Flink Row.toString map literal reparses, empty values kept") {
    val df = Seq("{browseProductCode=demHQ6TADV, frontProductUrl=, obtainPoints=42}")
      .toDF("s").select(Cleanse.parseRowMap($"s").as("m"))
    val m = df.as[Map[String, String]].head()
    assert(m("browseProductCode") == "demHQ6TADV")
    assert(m("obtainPoints") == "42")
    assert(m.contains("frontProductUrl") && (m("frontProductUrl") == null || m("frontProductUrl") == ""))
  }

  test("windowStart floors to the bucket") {
    val df = Seq("2024-01-01 00:16:57").toDF("s")
      .select(Cleanse.windowStart(to_timestamp($"s"), 600).as("w"))
    assert(df.as[String].head() == "2024-01-01 00:10:00")
  }
}
