package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.collections._
import graft.sources._

/** Storage snapshots of the DEPLOYMENT topologies: a sharded store
  * archives member-by-member (the backend snapshots per shard precisely
  * so a cluster restores member by member —
  * /root/reference/tests/bin/config.yaml:24-37,198), a replica set
  * archives once and reseeds every replica (the snapshot-transfer
  * recovery shape). Either way the restored members' sidecars are
  * SERVE-READY: the first search walks the restored graphs with the
  * primaries closed — no rebuild, no re-seal.
  */
class SnapshotTopologySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 4
  private val desc = CollectionDescriptor("c",
    Seq(DenseField("vector", dim)), named = false)

  private def vec(i: Int): Array[Float] = {
    val r = new java.util.Random(i * 2654435761L)
    Array.fill(dim)(r.nextGaussian().toFloat)
  }

  private def mkMember(ids: Seq[Int], prefix: String): ParquetCollectionStore = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    val df = ids.map(i => (f"$i%04d", s"""{"g":${i % 2}}""", vec(i)))
      .toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, d, numFiles = 1, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, d, field = "vector",
      m = 4, efConstruction = 16, numSegments = 1)
    new ParquetCollectionStore(d, "c", desc, hnswEf = 1024)
  }

  test("sharded storage snapshot restores serve-ready members (primaries closed, churn carried)") {
    val n = 60
    // seed by the wrapper's OWN placement so routed churn lands on the
    // member that already owns the id
    val byShard = (0 until n)
      .groupBy(i => ShardedCollectionStore.assignShard(f"$i%04d", 2))
    val members = (0 until 2)
      .map(s0 => mkMember(byShard.getOrElse(s0, Nil), s"graft-shsnap$s0"))
    val sh = new ShardedCollectionStore(members.toIndexedSeq)
    // churn THROUGH the wrapper: a guaranteed winner + a delete — the
    // snapshot must carry the absorbed state, not the sealed one
    val q = vec(991).map(_.toDouble)
    sh.upsertPoints("c", IndexedSeq(Point("winner", Some("""{"g":1}"""),
      dense = Map("vector" -> q.map(_.toFloat)))))
    sh.deletePoints("c", Set("0003"))
    CollectionStores.register("shsnap_src", sh)
    val path = java.nio.file.Files
      .createTempDirectory("graft-shsnap-arch").toString
    Snapshot.createStorage("shsnap_src", "c", path)
    val dst = java.nio.file.Files
      .createTempDirectory("graft-shsnap-dst").toString
    Snapshot.restoreStorage(spark, path, "shsnap_rst", "c", dst,
      hnswEf = 1024)
    val rst = CollectionStores.get("shsnap_rst")
      .asInstanceOf[ShardedCollectionStore]
    assert(rst.shardCount === 2)
    val spec = SearchSpec("vector", q, "cosine", 5)
    val got = rst.searchPoints("c", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2))
    val want = sh.searchPoints("c", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2))
    assert(got === want)
    assert(got.head._1 === "winner")
    assert(!got.exists(_._1 == "0003"))
    // every restored member served GRAPH-side, primaries closed — the
    // snapshot carried each member's index, serve-ready
    rst.shards.foreach { m =>
      val p = m.asInstanceOf[ParquetCollectionStore]
      assert(p.hnswSegmentsLoaded.get() > 0L)
      assert(p.filesOpened.get() === 0L)
    }
    // placement survived: routed point lookups still find their owner
    val fetch = rst.queryPoints("c", 0L, rst.pointCount("c"),
      withPayload = false, Nil, None, idFilter = Some(Set("winner")))
    assert(fetch.map(_.id).toSeq === Seq("winner"))
  }

  test("the full production topology (sharded-of-replicated) snapshots and restores") {
    val n = 60
    val byShard = (0 until n)
      .groupBy(i => ShardedCollectionStore.assignShard(f"$i%04d", 2))
    // each shard = a 2-replica set of identical parquet members
    val members = (0 until 2).map { s0 =>
      val reps = (0 until 2).map(_ =>
        mkMember(byShard.getOrElse(s0, Nil), s"graft-shrepsnap$s0"))
      new ReplicatedCollectionStore(reps.toIndexedSeq)
    }
    val sh = new ShardedCollectionStore(members.toIndexedSeq)
    val q = vec(551).map(_.toDouble)
    sh.upsertPoints("c", IndexedSeq(Point("winner", Some("""{"g":1}"""),
      dense = Map("vector" -> q.map(_.toFloat)))))
    CollectionStores.register("shrep_snap_src", sh)
    val path = java.nio.file.Files
      .createTempDirectory("graft-shrep-arch").toString
    Snapshot.createStorage("shrep_snap_src", "c", path)
    val dst = java.nio.file.Files
      .createTempDirectory("graft-shrep-dst").toString
    Snapshot.restoreStorage(spark, path, "shrep_snap_rst", "c", dst,
      hnswEf = 1024)
    val rst = CollectionStores.get("shrep_snap_rst")
      .asInstanceOf[ShardedCollectionStore]
    assert(rst.shardCount === 2)
    rst.shards.foreach { m =>
      assert(m.asInstanceOf[ReplicatedCollectionStore].replicas.length === 2)
    }
    val spec = SearchSpec("vector", q, "cosine", 5)
    val got = rst.searchPoints("c", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2))
    assert(got === sh.searchPoints("c", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2)))
    assert(got.head._1 === "winner")
    // every reseeded replica of every shard carries the index tree
    (0 until 2).foreach { i =>
      (0 until 2).foreach { j =>
        assert(new java.io.File(s"$dst/m$i/r$j/_hnsw/field.txt").isFile)
      }
    }
  }

  test("cluster snapshot of a sharded-of-wire topology: per-node archives + service swaps") {
    val byShard = (0 until 60)
      .groupBy(i => ShardedCollectionStore.assignShard(f"$i%04d", 2))
    val backends = (0 until 2).map { i =>
      val m = mkMember(byShard.getOrElse(i, Nil), s"graft-clwire$i")
      val name = s"clwire_backend_$i"
      CollectionStores.register(name, m)
      (name, new CollectionHttpServer(name).start())
    }
    try {
      val sh = new ShardedCollectionStore(backends.map { case (_, srv) =>
        new RestCollectionStore(srv.baseUrl): CollectionStore
      }.toIndexedSeq)
      val q = vec(661).map(_.toDouble)
      sh.upsertPoints("c", IndexedSeq(Point("winner", Some("""{"g":1}"""),
        dense = Map("vector" -> q.map(_.toFloat)))))
      CollectionStores.register("clwire_sh", sh)
      val spec = SearchSpec("vector", q, "cosine", 5)
      val want = sh.searchPoints("c", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2))
      val paths = (0 until 2).map(_ => java.nio.file.Files
        .createTempDirectory("graft-clwire-arch").toString)
      Snapshot.createStorageCluster("clwire_sh", "c", paths)
      // node-side archives: each carries the member's whole tree
      paths.foreach(p => assert(
        new java.io.File(s"$p/storage/_hnsw/field.txt").isFile))
      val dirs = (0 until 2).map(_ => java.nio.file.Files
        .createTempDirectory("graft-clwire-dst").toString)
      Snapshot.recoverStorageCluster("clwire_sh", "c", paths, dirs,
        hnswEf = 1024)
      // the wrapper serves unchanged through the same clients
      val got = sh.searchPoints("c", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2))
      assert(got === want)
      assert(got.head._1 === "winner")
      // every member SERVICE swapped to its recovered store and serves
      // graph-side with the primaries closed
      backends.zip(dirs).foreach { case ((name, _), d) =>
        val sw = CollectionStores.get(name)
          .asInstanceOf[ParquetCollectionStore]
        assert(sw.dir === d)
        assert(sw.hnswSegmentsLoaded.get() > 0L)
        assert(sw.filesOpened.get() === 0L)
      }
    } finally backends.foreach(_._2.stop())
  }

  test("storage snapshots are mutation-atomic: archives land on commit boundaries under churn") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val m = mkMember(0 until 50, "graft-snaplock")
    CollectionStores.register("snaplock_src", m)
    val batch = 5
    val nBatches = 12
    // the writer commits through the REGISTRY route (the connector's /
    // services' commit path) — each batch adds exactly `batch` new ids
    val writer = Future {
      (0 until nBatches).foreach { b =>
        val pts = (0 until batch).map { j =>
          Point(f"new-$b%02d-$j", Some(s"""{"g":$b}"""),
            dense = Map("vector" -> vec(1000 + b * batch + j)))
        }
        CollectionStores.update("snaplock_src") { s =>
          s.asInstanceOf[ParquetCollectionStore].appended("c", pts.toIndexedSeq)
        }
      }
    }
    // concurrent snapshots: each archive must drill clean AND restore
    // to a commit-boundary state (50 + k*batch points) — a torn
    // mid-commit copy would land off-boundary or fail the drill
    val archives = (0 until 5).map { i =>
      val p = java.nio.file.Files
        .createTempDirectory(s"graft-snaplock-arch$i").toString
      Snapshot.createStorage("snaplock_src", "c", p)
      Thread.sleep(30)
      p
    }
    // the PORTABLE form holds the same lock: its export also lands on
    // a commit boundary under churn
    val portable = java.nio.file.Files
      .createTempDirectory("graft-snaplock-port").toString
    Snapshot.create(spark, "snaplock_src", "c", portable)
    Await.result(writer, 60.seconds)
    val nPort = spark.read.parquet(s"$portable/points").count()
    assert((nPort - 50) % batch === 0L,
      s"portable snapshot caught a torn mid-commit state: $nPort points")
    archives.zipWithIndex.foreach { case (p, i) =>
      assert(Snapshot.verifyStorage(p) === Nil, s"archive $i dirty")
      val dst = java.nio.file.Files
        .createTempDirectory(s"graft-snaplock-dst$i").toString
      Snapshot.restoreStorage(spark, p, s"snaplock_rst_$i", "c", dst,
        hnswEf = 1024)
      val n = CollectionStores.get(s"snaplock_rst_$i").pointCount("c")
      assert((n - 50) % batch === 0L,
        s"archive $i caught a torn mid-commit state: $n points")
      assert(n >= 50 && n <= 50L + batch * nBatches)
    }
    // the final state itself is intact (all batches landed)
    assert(CollectionStores.get("snaplock_src").pointCount("c") ===
      50L + batch * nBatches)
  }

  test("storage snapshots resolve production aliases to the concrete collection") {
    val m = mkMember(0 until 30, "graft-alsnap")
    // the reindex-flip shape: readers address 'live', the concrete
    // collection is 'c'
    val aliased = new AliasedCollectionStore(m, Map("live" -> "c"))
    CollectionStores.register("alsnap_src", aliased)
    val path = java.nio.file.Files
      .createTempDirectory("graft-alsnap-arch").toString
    Snapshot.createStorage("alsnap_src", "live", path)
    // the archive is of the RESOLVED collection — manifest carries 'c',
    // the tree is the inner store's, and the drill passes
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "MANIFEST")))
    assert(manifest.contains("name=c"), manifest)
    assert(new java.io.File(s"$path/storage/_hnsw/field.txt").isFile)
    assert(Snapshot.verifyStorage(path) === Nil)
    // a restore serves identically to the source (alias-free; the
    // operator re-aliases explicitly)
    val dst = java.nio.file.Files
      .createTempDirectory("graft-alsnap-dst").toString
    Snapshot.restoreStorage(spark, path, "alsnap_rst", "c", dst,
      hnswEf = 1024)
    val q = vec(3).map(_.toDouble)
    val spec = SearchSpec("vector", q, "cosine", 5)
    val got = CollectionStores.get("alsnap_rst")
      .searchPoints("c", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2))
    assert(got === aliased.searchPoints("live", spec,
      withPayload = false, Nil).map(p => (p._1.id, p._2)))
    assert(got.nonEmpty)
  }

  test("verifyStorage adjudicates an archive without restoring it") {
    val m = mkMember(0 until 30, "graft-vsnap")
    CollectionStores.register("vsnap_src", m)
    val path = java.nio.file.Files
      .createTempDirectory("graft-vsnap-arch").toString
    Snapshot.createStorage("vsnap_src", "c", path)
    // a sound archive: zero findings (the DR drill passes)
    assert(Snapshot.verifyStorage(path) === Nil)
    // corrupt it the two ways crashes actually leave archives: a parked
    // marker (consolidation window) and a torn watermark
    val marker = new java.io.File(s"$path/storage/_hnsw/field.txt")
    java.nio.file.Files.move(marker.toPath,
      new java.io.File(s"$path/storage/_hnsw/field.txt.parked").toPath): Unit
    java.nio.file.Files.write(
      new java.io.File(s"$path/storage/_hnsw/inserted.txt").toPath,
      "garb".getBytes): Unit
    val findings = Snapshot.verifyStorage(path)
    assert(findings.exists(_.contains("PARKED")), findings)
    assert(findings.exists(_.contains("torn watermark")), findings)
    // a torn codes tier: the dir survived the copy but the partition
    // files did not — serving would silently fall back full-precision,
    // so the drill must flag it
    val codes = new java.io.File(s"$path/storage/_hnsw/codes/seg=0")
    assert(codes.mkdirs())
    val torn = Snapshot.verifyStorage(path)
    assert(torn.exists(_.contains("torn codes tier")), torn)
    // populated codes partitions drill clean again (on that check)
    java.nio.file.Files.write(
      new java.io.File(codes, "part-0.parquet").toPath,
      Array[Byte](1)): Unit
    assert(!Snapshot.verifyStorage(path)
      .exists(_.contains("torn codes tier")))
    // a sharded archive verifies member-by-member
    val byShard = (0 until 40)
      .groupBy(i => ShardedCollectionStore.assignShard(f"$i%04d", 2))
    val sh = new ShardedCollectionStore((0 until 2).map(i =>
      mkMember(byShard.getOrElse(i, Nil), s"graft-vsnap$i"):
        CollectionStore).toIndexedSeq)
    CollectionStores.register("vsnap_sh", sh)
    val shPath = java.nio.file.Files
      .createTempDirectory("graft-vsnap-sharch").toString
    Snapshot.createStorage("vsnap_sh", "c", shPath)
    assert(Snapshot.verifyStorage(shPath) === Nil)
    java.nio.file.Files.delete(
      new java.io.File(s"$shPath/member1/storage/_hnsw/field.txt").toPath): Unit
    val shFindings = Snapshot.verifyStorage(shPath)
    assert(shFindings.exists(f =>
      f.contains("member1") && f.contains("without its marker")), shFindings)
  }

  test("the DR drill crosses the wire: cluster archives verify node-side, findings ship back") {
    val byShard = (0 until 40)
      .groupBy(i => ShardedCollectionStore.assignShard(f"$i%04d", 2))
    // a MIXED cluster: shard 0 behind the JSON wire, shard 1 behind the
    // binary wire — the drill must fan across BOTH transports
    val m0 = mkMember(byShard.getOrElse(0, Nil), "graft-vwire0")
    val m1 = mkMember(byShard.getOrElse(1, Nil), "graft-vwire1")
    CollectionStores.register("vwire_backend_0", m0)
    CollectionStores.register("vwire_backend_1", m1)
    val rest = new CollectionHttpServer("vwire_backend_0").start()
    val grpc = new CollectionGrpcServer("vwire_backend_1").start()
    try {
      val restClient = new RestCollectionStore(rest.baseUrl)
      val grpcClient = new GrpcCollectionStore(grpc.host, grpc.port)
      val sh = new ShardedCollectionStore(
        IndexedSeq(restClient, grpcClient))
      CollectionStores.register("vwire_sh", sh)
      val paths = (0 until 2).map(_ => java.nio.file.Files
        .createTempDirectory("graft-vwire-arch").toString)
      Snapshot.createStorageCluster("vwire_sh", "c", paths)
      // a sound cluster: zero findings through either transport
      assert(Snapshot.verifyStorageCluster("vwire_sh", "c", paths) === Nil)
      assert(restClient.verifyStorageSnapshot("c", paths(0)) === Nil)
      assert(grpcClient.verifyStorageSnapshot("c", paths(1)) === Nil)
      // corrupt shard 1's NODE-side archive (a parked marker — the
      // crashed-consolidation capture) — the finding must come back over
      // the BINARY wire with the member prefix an operator reads
      java.nio.file.Files.move(
        new java.io.File(s"${paths(1)}/storage/_hnsw/field.txt").toPath,
        new java.io.File(
          s"${paths(1)}/storage/_hnsw/field.txt.parked").toPath): Unit
      val findings = Snapshot.verifyStorageCluster("vwire_sh", "c", paths)
      assert(findings.nonEmpty)
      assert(findings.forall(_.startsWith("shard 1: ")), findings)
      assert(findings.exists(_.contains("PARKED")), findings)
      // shard 0's archive still drills clean through the JSON wire
      assert(restClient.verifyStorageSnapshot("c", paths(0)) === Nil)
      // the cluster verbs resolve ALIASES too: drilling through an
      // aliased wrapper of the same topology sees the same findings
      CollectionStores.register("vwire_sh_al",
        new AliasedCollectionStore(sh, Map("live" -> "c")))
      val viaAlias = Snapshot.verifyStorageCluster(
        "vwire_sh_al", "live", paths)
      assert(viaAlias === findings)
    } finally { rest.stop(); grpc.stop() }
  }

  test("cluster recover is member-idempotent: a failed member re-runs without disturbing completed ones") {
    val byShard = (0 until 40)
      .groupBy(i => ShardedCollectionStore.assignShard(f"$i%04d", 2))
    val backends = (0 until 2).map { i =>
      val m = mkMember(byShard.getOrElse(i, Nil), s"graft-idem$i")
      val name = s"idem_backend_$i"
      CollectionStores.register(name, m)
      (name, new CollectionHttpServer(name).start())
    }
    try {
      val sh = new ShardedCollectionStore(backends.map { case (_, srv) =>
        new RestCollectionStore(srv.baseUrl): CollectionStore
      }.toIndexedSeq)
      CollectionStores.register("idem_sh", sh)
      val q = vec(447).map(_.toDouble)
      val spec = SearchSpec("vector", q, "cosine", 5)
      val want = sh.searchPoints("c", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2))
      val paths = (0 until 2).map(_ => java.nio.file.Files
        .createTempDirectory("graft-idem-arch").toString)
      Snapshot.createStorageCluster("idem_sh", "c", paths)
      val dirs = (0 until 2).map(_ => java.nio.file.Files
        .createTempDirectory("graft-idem-dst").toString)
      // member 1's recover fails (bad archive path) AFTER member 0
      // already swapped — the partial-failure shape of any fanned
      // control-plane verb
      intercept[Exception] {
        Snapshot.recoverStorageCluster("idem_sh", "c",
          Seq(paths(0), "/nonexistent/archive"), dirs, hnswEf = 1024)
      }
      val sw0 = CollectionStores.get("idem_backend_0")
        .asInstanceOf[ParquetCollectionStore]
      assert(sw0.dir === dirs(0)) // member 0 completed
      // the cluster still serves (member 1 kept its pre-recover store)
      assert(sh.searchPoints("c", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)) === want)
      // re-run with the right paths: member 1 completes, member 0
      // harmlessly reseeds again (fresh dirs — recover is idempotent at
      // the member level, no state from the failed run is load-bearing)
      val dirs2 = (0 until 2).map(_ => java.nio.file.Files
        .createTempDirectory("graft-idem-dst2").toString)
      Snapshot.recoverStorageCluster("idem_sh", "c", paths, dirs2,
        hnswEf = 1024)
      backends.zip(dirs2).foreach { case ((name, _), d) =>
        assert(CollectionStores.get(name)
          .asInstanceOf[ParquetCollectionStore].dir === d)
      }
      assert(sh.searchPoints("c", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)) === want)
    } finally backends.foreach(_._2.stop())
  }

  test("replicated-of-wire cluster: ONE node-side archive reseeds every member service") {
    // an HA pair behind MIXED transports: replica 0 on the JSON wire,
    // replica 1 on the binary wire — interchangeable copies by the
    // write-all contract
    val m0 = mkMember(0 until 40, "graft-repwire0")
    val m1 = mkMember(0 until 40, "graft-repwire1")
    CollectionStores.register("repwire_backend_0", m0)
    CollectionStores.register("repwire_backend_1", m1)
    val rest = new CollectionHttpServer("repwire_backend_0").start()
    val grpc = new CollectionGrpcServer("repwire_backend_1").start()
    try {
      val rep = new ReplicatedCollectionStore(IndexedSeq(
        new RestCollectionStore(rest.baseUrl),
        new GrpcCollectionStore(grpc.host, grpc.port)))
      CollectionStores.register("repwire_rep", rep)
      // churn THROUGH the wrapper: both services absorb the write-all
      val q = vec(881).map(_.toDouble)
      rep.upsertPoints("c", IndexedSeq(Point("winner", Some("""{"g":1}"""),
        dense = Map("vector" -> q.map(_.toFloat)))))
      rep.deletePoints("c", Set("0003"))
      val spec = SearchSpec("vector", q, "cosine", 5)
      val want = rep.searchPoints("c", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2))
      // ONE archive, written node-side by replica 0's service
      val path = java.nio.file.Files
        .createTempDirectory("graft-repwire-arch").toString
      Snapshot.createStorageCluster("repwire_rep", "c", Seq(path))
      assert(new java.io.File(s"$path/storage/_hnsw/field.txt").isFile)
      // the DR drill on the single archive
      assert(Snapshot.verifyStorageCluster(
        "repwire_rep", "c", Seq(path)) === Nil)
      // the one archive reseeds BOTH member services (per-member dirs),
      // each swapping to its recovered store
      val dirs = (0 until 2).map(_ => java.nio.file.Files
        .createTempDirectory("graft-repwire-dst").toString)
      Snapshot.recoverStorageCluster("repwire_rep", "c", Seq(path), dirs,
        hnswEf = 1024)
      val got = rep.searchPoints("c", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2))
      assert(got === want)
      assert(got.head._1 === "winner")
      assert(!got.exists(_._1 == "0003"))
      // every member SERVICE swapped to its recovered store; the replica
      // read path touches only ONE member per search, so prove each
      // member serve-ready by searching ITS store directly — graph-side,
      // primaries closed, churned state carried
      Seq("repwire_backend_0", "repwire_backend_1").zip(dirs).foreach {
        case (name, d) =>
          val sw = CollectionStores.get(name)
            .asInstanceOf[ParquetCollectionStore]
          assert(sw.dir === d)
          val own = sw.searchPoints("c", spec, withPayload = false, Nil)
            .map(p => (p._1.id, p._2))
          assert(own === want)
          assert(sw.hnswSegmentsLoaded.get() > 0L)
          assert(sw.filesOpened.get() === 0L)
      }
    } finally { rest.stop(); grpc.stop() }
  }

  test("replicated storage snapshot reseeds every replica from one archive, serve-ready") {
    val members = (0 until 2).map(_ => mkMember(0 until 40, "graft-repsnap"))
    val rep = new ReplicatedCollectionStore(members.toIndexedSeq)
    val q = vec(773).map(_.toDouble)
    rep.upsertPoints("c", IndexedSeq(Point("winner", Some("""{"g":0}"""),
      dense = Map("vector" -> q.map(_.toFloat)))))
    CollectionStores.register("repsnap_src", rep)
    val path = java.nio.file.Files
      .createTempDirectory("graft-repsnap-arch").toString
    Snapshot.createStorage("repsnap_src", "c", path)
    // ONE archive on disk (replicas are interchangeable copies)
    assert(new java.io.File(s"$path/member0/storage").isDirectory)
    assert(!new java.io.File(s"$path/member1").exists())
    val dst = java.nio.file.Files
      .createTempDirectory("graft-repsnap-dst").toString
    Snapshot.restoreStorage(spark, path, "repsnap_rst", "c", dst,
      hnswEf = 1024)
    val rst = CollectionStores.get("repsnap_rst")
      .asInstanceOf[ReplicatedCollectionStore]
    assert(rst.replicas.length === 2)
    val spec = SearchSpec("vector", q, "cosine", 5)
    val got = rst.searchPoints("c", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2))
    assert(got === rep.searchPoints("c", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2)))
    assert(got.head._1 === "winner")
    // both reseeded replicas carry the index tree (either can serve a
    // failover graph-side)
    (0 until 2).foreach { i =>
      assert(new java.io.File(s"$dst/r$i/_hnsw/field.txt").isFile)
    }
  }
}
