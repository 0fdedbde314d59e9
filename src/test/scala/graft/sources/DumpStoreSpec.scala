package graft.sources

import graft.{SparkSpec, Tables}
import java.nio.file.Files

/** Dump manager semantics (reference source.py:1092-1280): ensure is
  * idempotent, force re-fetches, completeness is commit-ordered
  * (metadata after data), failed fetches leave nothing behind, and a
  * release dir serves ref_* queries as a plain sf dir.
  */
class DumpStoreSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft-dump").toString
  private val Rel = "2026-01"
  private val At = "2026-01-01T00:00:00"

  test("ensure fetches once, then serves the pinned copy") {
    val store = new DumpStore(spark, tmp())
    var fetches = 0
    def fetch = { fetches += 1; tables.table("region") }
    assert(!store.exists(Rel, "region"))
    store.ensure(Rel, "region", At)(fetch)
    assert(store.exists(Rel, "region") && fetches == 1)
    store.ensure(Rel, "region", At)(fetch) // hit: no re-fetch
    assert(fetches == 1)
    assert(store.read(Rel, "region").count() == tables.region.count())
  }

  test("force re-fetches; delete removes; list enumerates complete entries") {
    val store = new DumpStore(spark, tmp())
    var fetches = 0
    def fetch = { fetches += 1; tables.table("nation") }
    store.ensure(Rel, "nation", At)(fetch)
    store.ensure(Rel, "nation", At, force = true)(fetch)
    assert(fetches == 2)
    store.ensure("2026-02", "region", At)(tables.table("region"))
    assert(store.list().map(e => (e.release, e.theme)) ==
      Seq((Rel, "nation"), ("2026-02", "region")))
    assert(store.list().forall(_.rows > 0))
    assert(store.delete(Rel, "nation"))
    assert(!store.exists(Rel, "nation") && !store.delete(Rel, "nation"))
    assert(store.list().map(_.theme) == Seq("region"))
  }

  test("a failed fetch leaves no partial dump (reference :1230 cleanup)") {
    val store = new DumpStore(spark, tmp())
    intercept[RuntimeException] {
      store.ensure(Rel, "part", At)(
        tables.part.select(org.apache.spark.sql.functions
          .raise_error(org.apache.spark.sql.functions.lit("boom"))))
    }
    assert(!store.exists(Rel, "part"))
    assert(store.list().isEmpty)
  }

  test("data without committed metadata is not a complete dump") {
    val base = tmp()
    val store = new DumpStore(spark, base)
    // Simulate a crash after the parquet landed but before the
    // metadata commit: write data directly, no sidecar.
    tables.table("region").write.parquet(s"$base/release=$Rel/region.parquet")
    assert(!store.exists(Rel, "region"))
    // The next ensure completes the entry.
    store.ensure(Rel, "region", At)(tables.table("region"))
    assert(store.exists(Rel, "region"))
  }

  test("an ensured release dir serves ref_* queries as an sf dir") {
    val store = new DumpStore(spark, tmp())
    store.ensure(Rel, "part", At)(tables.table("part"))
    val fromDump = graft.queries.RefQueries.refRoads(spark, store.releaseDir(Rel))
    val fromLake = graft.queries.RefQueries.refRoads(spark, sfDir)
    assert(fromDump.except(fromLake).isEmpty && fromLake.except(fromDump).isEmpty)
  }

  test("cli verbs: ensure-dump / list-dumps / delete-dump dispatch") {
    val base = tmp()
    graft.Cli.run(spark, Seq("ensure-dump", sfDir, base, "region", Rel, s"--date=$At"))
    val store = new DumpStore(spark, base)
    assert(store.exists(Rel, "region"))
    graft.Cli.run(spark, Seq("list-dumps", base))
    graft.Cli.run(spark, Seq("delete-dump", base, "region", Rel))
    assert(!store.exists(Rel, "region"))
    intercept[IllegalArgumentException] {
      graft.Cli.run(spark, Seq("ensure-dump", sfDir, base, "nonsense", Rel))
    }
  }
}
