package graft.sources

import graft.SparkSpec

class OffresUpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  test("keyed upsert sink: duplicate ids collapse, last write wins, rewrite is idempotent") {
    UpsertStoreRegistry.clear("t1")
    val df = Seq(
      ("a", 1, "first"), ("b", 2, "only"), ("a", 3, "second")
    ).toDF("id", "v", "label")

    df.coalesce(1).write.format("graft.sources.OffresUpsertSink")
      .option("store", "t1").mode("append").save()

    val store = UpsertStoreRegistry.store("t1")
    assert(store.size() == 2)
    assert(store.get("a")(2) == "second") // within-task later write wins

    // re-running the same write (task retry / job rerun) changes nothing
    df.coalesce(1).write.format("graft.sources.OffresUpsertSink")
      .option("store", "t1").mode("append").save()
    assert(store.size() == 2)
    assert(store.get("a")(2) == "second")
  }

  test("upsert across jobs: fresher batch overwrites per key (S6 full analog)") {
    UpsertStoreRegistry.clear("t2")
    Seq(("x", "v1"), ("y", "v1")).toDF("id", "payload")
      .write.format("graft.sources.OffresUpsertSink")
      .option("store", "t2").mode("append").save()
    Seq(("y", "v2"), ("z", "v2")).toDF("id", "payload")
      .write.format("graft.sources.OffresUpsertSink")
      .option("store", "t2").mode("append").save()
    val store = UpsertStoreRegistry.store("t2")
    assert(store.size() == 3)
    assert(store.get("y")(1) == "v2" && store.get("x")(1) == "v1")
  }

  test("custom key column") {
    UpsertStoreRegistry.clear("t3")
    Seq((1L, "k1", 10.0), (2L, "k1", 20.0), (3L, "k2", 30.0))
      .toDF("seq", "bizkey", "v")
      .coalesce(1)
      .write.format("graft.sources.OffresUpsertSink")
      .option("store", "t3").option("keyColumn", "bizkey").mode("append").save()
    assert(UpsertStoreRegistry.store("t3").size() == 2)
    assert(UpsertStoreRegistry.store("t3").get("k1")(2) == 20.0)
  }

  test("delete ops retire keys; delete-then-upsert resurrects; replay is idempotent") {
    UpsertStoreRegistry.clear("t4")
    Seq(("a", "v1", "index"), ("b", "v1", "index"), ("c", "v1", "index"))
      .toDF("id", "payload", "op")
      .write.format("graft.sources.OffresUpsertSink")
      .option("store", "t4").option("opColumn", "op").mode("append").save()
    val store = UpsertStoreRegistry.store("t4")
    assert(store.size() == 3)
    // bulk batch mixing ops, single task to pin within-task ordering:
    // delete b (stays gone), delete-then-reindex c (resurrects)
    val batch = Seq(
      ("b", "dead", "delete"), ("c", "dead", "DELETE"), ("c", "v2", "index")
    ).toDF("id", "payload", "op")
    batch.coalesce(1).write.format("graft.sources.OffresUpsertSink")
      .option("store", "t4").option("opColumn", "op").mode("append").save()
    assert(store.size() == 2 && !store.containsKey("b"))
    assert(store.get("c")(1) == "v2", "upsert after delete must resurrect the key")
    // replay (task retry / job rerun): same keyed ops, same final state
    batch.coalesce(1).write.format("graft.sources.OffresUpsertSink")
      .option("store", "t4").option("opColumn", "op").mode("append").save()
    assert(store.size() == 2 && store.get("c")(1) == "v2")
    // deleting an absent key is a no-op, as in a bulk request
    Seq(("nope", "x", "delete")).toDF("id", "payload", "op")
      .write.format("graft.sources.OffresUpsertSink")
      .option("store", "t4").option("opColumn", "op").mode("append").save()
    assert(store.size() == 2)
  }
}
