package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  test("defaults mirror the reference application.conf shape") {
    val c = GraftConfig()
    assert(c.odsTopic == "KAFKA-ODS-TOPIC")
    assert(c.dimTopic == "KAFKA-DIM-TOPIC")
    assert(c.dwdBrowseLogTopic == "KAFKA-DWD-BROWSE-LOG-TOPIC")
    assert(c.dimProductCategory == "DIM_PRODUCT_CATEGORY")
    assert(c.kafkaFromEarliest && c.startingOffsets == "earliest")
  }

  test("file values override defaults; offsets flag flips") {
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".properties")
    java.nio.file.Files.writeString(f,
      """kafka.cluster=k1:9092,k2:9092
        |consumer.kafka.from.earliest=false
        |kafka.ods.topic=MY-ODS
        |""".stripMargin)
    val c = GraftConfig.fromFile(f.toString)
    assert(c.kafkaBrokers == "k1:9092,k2:9092")
    assert(!c.kafkaFromEarliest && c.startingOffsets == "latest")
    assert(c.odsTopic == "MY-ODS")
    assert(c.dimTopic == "KAFKA-DIM-TOPIC") // untouched key keeps default
  }

  test("boolean flags parse tolerantly; junk names the key") {
    val f = java.nio.file.Files.createTempFile("graft_cfg_b", ".properties")
    java.nio.file.Files.writeString(f, "consumer.kafka.from.earliest=YES\n")
    assert(GraftConfig.fromFile(f.toString).kafkaFromEarliest)
    java.nio.file.Files.writeString(f, "consumer.kafka.from.earliest=maybe\n")
    val e = intercept[IllegalArgumentException] {
      GraftConfig.fromFile(f.toString).kafkaFromEarliest
    }
    assert(e.getMessage.contains("consumer.kafka.from.earliest"))
  }

  test("missing explicit file is an error; missing resource is not") {
    intercept[java.io.IOException] {
      GraftConfig.fromFile("/nonexistent/graft.properties")
    }
    assert(GraftConfig.load().odsTopic == "KAFKA-ODS-TOPIC")
  }
}
