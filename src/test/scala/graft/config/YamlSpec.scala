package graft.config

import org.scalatest.funsuite.AnyFunSuite

import graft.ConfigError
import graft.config.Yaml._

/** L2 (round 10): the YAML reader loads the reference's own
  * queries.yml verbatim and drives the same catalog model the JSON
  * form feeds; unsupported YAML constructs fail as typed
  * ConfigErrors naming the line.
  */
class YamlSpec extends AnyFunSuite {

  private val fixture = "src/test/resources/queries.yml"

  test("reference queries.yml loads 1:1 into the QueryConfig catalog") {
    val cat = QueryConfig.catalogFromYaml(fixture)
    assert(cat.keySet == Set(
      "roads", "buildings", "education", "health", "markets", "places", "power"))

    val roads = cat("roads")
    assert(roads.theme == "transportation" && roads.typeName == "segment")
    assert(roads.filter.isEmpty) // the filter line is commented out
    assert(roads.sectorTitle.contains("Road Network"))
    assert(roads.sectorTag.contains("roads"))
    assert(roads.upsertKey == "id") // read from the agol block
    assert(roads.agol("item_title") == "{title}")
    assert(roads.agol("tags") == "{tags_base} + ['transportation', 'roads', 'foundational_data']")

    val education = cat("education")
    assert(education.theme == "places" && education.typeName == "place")
    assert(education.filter.contains("categories.primary = 'education'"))
    assert(education.buildingFilter.contains("subtype = 'education'"))

    val markets = cat("markets")
    assert(markets.filter.contains(
      "categories.primary IN ('retail', 'shopping', 'food_and_drink')"))

    val power = cat("power")
    assert(power.geometrySplit)          // plain-scalar boolean `true`
    assert(!power.isMultilayer)
    assert(power.theme == "base" && power.typeName == "infrastructure")
  }

  test("catalog entries drive MetadataTemplate exactly as the JSON form") {
    val cat = QueryConfig.catalogFromYaml(fixture)
    val vars = Map(
      "title" -> "Afghanistan Road Network",
      "tags_base" -> "['afg']")
    assert(MetadataTemplate.render(cat("roads").agol("item_title"), vars) ==
      "Afghanistan Road Network")
    assert(MetadataTemplate.render(cat("roads").agol("tags"), vars) ==
      "['afg'] + ['transportation', 'roads', 'foundational_data']")
  }

  test("scalar typing: bool/int/float/null/quoted/flow/block lists") {
    val y = Yaml.parse(
      """a: 7
        |b: -3.5
        |c: true
        |d: ~
        |e: "quoted # not a comment"
        |f: 'single ''escaped'''
        |g: [1, two, "three, four"]
        |h:
        |  - x
        |  - key: v
        |    other: 2
        |i: plain with spaces   # trailing comment
        |""".stripMargin).asInstanceOf[YMap]
    assert(y.get("a").contains(YLong(7)))
    assert(y.get("b").contains(YDouble(-3.5)))
    assert(y.get("c").contains(YBool(true)))
    assert(y.get("d").contains(YNull))
    assert(y.get("e").contains(YStr("quoted # not a comment")))
    assert(y.get("f").contains(YStr("single 'escaped'")))
    assert(y.get("g").contains(YList(Vector(YLong(1), YStr("two"), YStr("three, four")))))
    val h = y.get("h").get.asInstanceOf[YList]
    assert(h.items(0) == YStr("x"))
    val hm = h.items(1).asInstanceOf[YMap]
    assert(hm.get("key").contains(YStr("v")) && hm.get("other").contains(YLong(2)))
    assert(y.get("i").contains(YStr("plain with spaces")))
  }

  test("multi-line double-quoted scalars fold like agol_metadata.yml templates") {
    val y = Yaml.parse(
      """templates:
        |  description: "
        |    First line<br>
        |    second line.<br>
        |
        |    After blank."
        |  snippet: "one line"
        |""".stripMargin).asInstanceOf[YMap]
    val t = y.get("templates").get.asInstanceOf[YMap]
    assert(t.get("snippet").contains(YStr("one line")))
    val d = t.get("description").get.asInstanceOf[YStr].v
    assert(d == " First line<br> second line.<br>\nAfter blank.")
  }

  test("unsupported constructs raise typed ConfigError naming the line") {
    def err(src: String): ConfigError = intercept[ConfigError](Yaml.parse(src))
    assert(err("a:\n\tb: 1").getMessage.contains("tab in indentation"))
    assert(err("a: &anchor v").getMessage.contains("anchors"))
    assert(err("a: *anchor").getMessage.contains("anchors"))
    assert(err("a: !!binary abc").getMessage.contains("tags"))
    assert(err("a: {k: v}").getMessage.contains("flow mappings"))
    assert(err("a: |\n  block").getMessage.contains("block scalars"))
    assert(err("%YAML 1.2\na: 1").getMessage.contains("directives"))
    assert(err("---\na: 1").getMessage.contains("multi-document"))
    assert(err("a: \"unterminated").getMessage.contains("unterminated"))
    val e = err("a: 1\n\tb: 2")
    assert(e.context.get("line").contains("2"))
  }

  test("missing required keys are ConfigErrors naming the entry") {
    val tmp = java.nio.file.Files.createTempFile("cat", ".yml")
    java.nio.file.Files.write(tmp, "noType:\n  theme: places\n".getBytes)
    val e = intercept[ConfigError](QueryConfig.catalogFromYaml(tmp.toString))
    assert(e.getMessage.contains("noType") && e.getMessage.contains("'type'"))
    java.nio.file.Files.delete(tmp)
  }
}
