package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.collections._
import graft.sources._
import graft.sources.AliasedCollectionStore._

/** Collection-alias semantics at the store seam: resolution, atomic
  * swap, listing, single-level rule, and wire parity through the HTTP
  * service (swaps visible to remote readers immediately).
  */
class AliasSpec extends AnyFunSuite {

  private def desc(n: String) =
    CollectionDescriptor(n, Seq(DenseField("v", 2)), named = false)

  private def pt(id: String, tag: String) = Point(
    id, payload = Some(s"""{"gen": "$tag"}"""),
    dense = Map("v" -> Array(1f, 2f)), multi = Map.empty, sparse = Map.empty)

  private def twoGen = new InMemoryCollectionStore(
    Map("a" -> desc("a"), "b" -> desc("b")),
    Map("a" -> IndexedSeq(pt("1", "old"), pt("2", "old")),
      "b" -> IndexedSeq(pt("1", "new"), pt("2", "new"), pt("3", "new"))))

  private def gen(st: CollectionStore, c: String): Seq[String] =
    st.queryPoints(c, 0L, st.pointCount(c), withPayload = true, Seq("v"), None)
      .map(_.payload.get).toSeq

  test("alias resolves every surface; swap is atomic; delete restores the bare store") {
    CollectionStores.register("alias_t1", twoGen)
    updateAliases("alias_t1", Seq(CreateAlias("live", "a")))
    val s1 = CollectionStores.get("alias_t1")
    assert(s1.pointCount("live") === 2L)
    assert(s1.collectionInfo("live").name === "a")
    assert(gen(s1, "live").forall(_.contains("old")))
    assert(s1.collectionNames === Seq("a", "b", "live"))
    // concrete names stay addressable next to the alias
    assert(s1.pointCount("a") === 2L && s1.pointCount("b") === 3L)
    // the reindex flip: delete+create in ONE batch
    updateAliases("alias_t1", Seq(DeleteAlias("live"), CreateAlias("live", "b")))
    val s2 = CollectionStores.get("alias_t1")
    assert(s2.pointCount("live") === 3L)
    assert(gen(s2, "live").forall(_.contains("new")))
    assert(listAliases("alias_t1") === Map("live" -> "b"))
    // deleting the last alias unwraps to the bare store
    updateAliases("alias_t1", Seq(DeleteAlias("live")))
    assert(!CollectionStores.get("alias_t1").isInstanceOf[AliasedCollectionStore])
    assert(listAliases("alias_t1") === Map.empty)
    CollectionStores.remove("alias_t1")
  }

  test("aliases are single-level: pointing an alias at an alias is rejected") {
    CollectionStores.register("alias_t2", twoGen)
    updateAliases("alias_t2", Seq(CreateAlias("live", "a")))
    intercept[IllegalArgumentException] {
      updateAliases("alias_t2", Seq(CreateAlias("hot", "live")))
    }
    // the failed batch must not have corrupted the map
    assert(listAliases("alias_t2") === Map("live" -> "a"))
    CollectionStores.remove("alias_t2")
  }

  test("writes through an alias land on the target; DDL via an alias is rejected") {
    CollectionStores.register("alias_t4", twoGen)
    val srv = new CollectionHttpServer("alias_t4").start()
    try {
      val client = new RestCollectionStore(srv.baseUrl)
      client.updateAliases(Seq(CreateAlias("live", "a")))
      // wire upsert addressed to the ALIAS: the service resolves it and
      // the point lands in collection a (visible via alias AND target)
      client.upsertPoints("live", Seq(pt("9", "old")))
      assert(client.pointCount("live") === 3L)
      assert(client.pointCount("a") === 3L)
      assert(client.pointCount("b") === 3L) // untouched
      // delete through the alias too
      client.deletePoints("live", Set("9"))
      assert(client.pointCount("a") === 2L)
      // the wrapper (and its alias map) survive every mutation
      assert(client.listAliases() === Map("live" -> "a"))
      // DDL guards: create under, or drop via, an alias name
      intercept[IllegalStateException] {
        client.createCollection(CollectionDescriptor("live", Seq(DenseField("v", 2))))
      }
      intercept[IllegalStateException] { client.deleteCollection("live") }
      // alias validity: unknown target / shadowing a collection name
      intercept[IllegalArgumentException] {
        client.updateAliases(Seq(CreateAlias("x", "no_such")))
      }
      intercept[IllegalArgumentException] {
        client.updateAliases(Seq(CreateAlias("b", "a")))
      }
    } finally {
      srv.stop()
      CollectionStores.remove("alias_t4")
    }
  }

  test("aliases cross the wire: remote create, read-through, list, swap") {
    CollectionStores.register("alias_t3", twoGen)
    val srv = new CollectionHttpServer("alias_t3").start()
    try {
      val client = new RestCollectionStore(srv.baseUrl)
      client.updateAliases(Seq(CreateAlias("live", "a")))
      assert(client.listAliases() === Map("live" -> "a"))
      assert(client.pointCount("live") === 2L)
      assert(gen(client, "live").forall(_.contains("old")))
      // SHOW TABLES over the wire lists the alias
      assert(client.collectionNames === Seq("a", "b", "live"))
      // per-collection alias listing (the other Qdrant alias read)
      assert(client.listCollectionAliases("a") === Seq("live"))
      assert(client.listCollectionAliases("b") === Seq.empty)
      client.updateAliases(Seq(DeleteAlias("live"), CreateAlias("live", "b")))
      assert(client.listCollectionAliases("b") === Seq("live"))
      assert(client.pointCount("live") === 3L)
      assert(gen(client, "live").forall(_.contains("new")))
      // a scored search through the alias serves the aliased generation
      val hits = client.searchPoints("live",
        SearchSpec("v", Array(1.0, 2.0), "dot", 3),
        withPayload = true, Seq.empty)
      assert(hits.size === 3 && hits.forall(_._1.payload.get.contains("new")))
    } finally {
      srv.stop()
      CollectionStores.remove("alias_t3")
    }
  }
}
