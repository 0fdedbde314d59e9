package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Layered settings resolution (reference settings.py Config /
  * utils.py:524 safe_get_env): precedence order, env-name mapping,
  * dotenv parsing, fail-fast malformed input, secret redaction.
  */
class SettingsSpec extends AnyFunSuite {

  test("precedence: overrides > env > file > defaults") {
    // defaults only
    assert(Settings.load()("publish.mode") == "auto")
    // file beats defaults
    val file = "publish.mode=append\ndump.base=/lake/dumps"
    assert(Settings.load(Some(file))("publish.mode") == "append")
    assert(Settings.load(Some(file))("dump.base") == "/lake/dumps")
    // env beats file
    val env = Map("GRAFT_PUBLISH_MODE" -> "overwrite")
    assert(Settings.load(Some(file), env)("publish.mode") == "overwrite")
    // still falls through to file where env is silent
    assert(Settings.load(Some(file), env)("dump.base") == "/lake/dumps")
    // explicit override beats everything
    val s = Settings.load(Some(file), env, Map("publish.mode" -> "initial"))
    assert(s("publish.mode") == "initial")
  }

  test("env names derive from dotted keys under the GRAFT_ prefix; others never leak in") {
    assert(Settings.envKey("dump.base") == "GRAFT_DUMP_BASE")
    assert(Settings.envKey("processing.shuffle_partitions")
      == "GRAFT_PROCESSING_SHUFFLE_PARTITIONS")
    // non-GRAFT environment content is ignored wholesale
    val s = Settings.load(env = Map(
      "PATH" -> "/usr/bin", "publish.mode" -> "evil", "HOME" -> "/root"))
    assert(s("publish.mode") == "auto")
    assert(s.get("path").isEmpty && s.get("home").isEmpty)
  }

  test("dotenv parsing: comments, blanks, env-spelled keys normalize; malformed line fails fast") {
    val parsed = Settings.parseFile(
      """# store locations
        |
        |GRAFT_DUMP_BASE=/x
        |service.base = /y
        |""".stripMargin)
    assert(parsed == Map("dump.base" -> "/x", "service.base" -> "/y"))
    val e = intercept[graft.ConfigError] {
      Settings.parseFile("dump.base /x", origin = "bad.env")
    }
    assert(e.context("stage") == "settings" && e.context("file") == "bad.env")
    assert(e.getMessage.contains("line 1"))
  }

  test("typed access: int parses or names the key in a ConfigError") {
    val s = Settings.load(Some("processing.shuffle_partitions=64"))
    assert(s.int("processing.shuffle_partitions") == 64)
    val bad = Settings.load(Some("processing.shuffle_partitions=many"))
    val e = intercept[graft.ConfigError] { bad.int("processing.shuffle_partitions") }
    assert(e.getMessage.contains("processing.shuffle_partitions"))
    val missing = intercept[graft.ConfigError] { s("no.such.key") }
    assert(missing.context("stage") == "settings")
  }

  test("rendered masks secret-shaped keys") {
    val s = Settings.load(Some("publish.password=hunter2\nservice.api_token=abc\ndump.base=/x"))
    val r = s.rendered
    assert(r.contains("publish.password=****"))
    assert(r.contains("service.api_token=****"))
    assert(r.contains("dump.base=/x"))
    assert(!r.contains("hunter2") && !r.contains("abc"))
  }

  test("unreadable settings file is a ConfigError with the path in context") {
    val e = intercept[graft.ConfigError] {
      Settings.loadFile("/nonexistent/graft_settings.env")
    }
    assert(e.context("file") == "/nonexistent/graft_settings.env")
  }
}
