package graft

import graft.config.DedupConfig
import graft.functions.{AudioPcm, SimHash, TextShingles}
import graft.operators._
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler: times each pipeline stage independently.
  * Usage: runMain graft.Profile [nClips] [cores] */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkUtil.session(cores, "graft-profile")
    val cfg = DedupConfig.default

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val clips = ClipCorpus.clips(spark, CorpusConfig(seed = 42L, n = n)).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("synth+cache")(clips.count())
    time("synth-only-recount")(clips.count())

    if (args.length > 2 && args(2) == "explain") {
      // args(4): optional comma list of query names (default: the r2 audit set)
      val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
      val names = if (args.length > 4) args(4).split(",").toSeq
        else Seq("q_topk_per_source", "q_token_stats", "q_cosine_topk",
          "q_lsh_band_pairs", "q_suffix_pairs")
      val qmap = SparkEntry.queries
      names.foreach { nm =>
          println(s"########## $nm")
          println(qmap(nm)(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "recall") {
      // dup-pair recall/precision vs planted clusters at ANY corpus size —
      // the PipelineSpec check (n=1000) re-run at scale, so quality claims
      // aren't extrapolated from the toy fixture.
      // SPARK_GRAFT_AUDIO_FLOOR overrides the audio verify threshold so the
      // recall-vs-floor curve (0.30/0.35/0.40) is measured, not inherited.
      val rcfg = sys.env.get("SPARK_GRAFT_AUDIO_FLOOR")
        .map(f => cfg.copy(audioJaccardThreshold = f.toDouble)).getOrElse(cfg)
      println(s"[profile] audio verify floor = ${rcfg.audioJaccardThreshold}")
      val res = time("pipeline")(DedupPipeline.run(spark, clips, rcfg))
      val golden = ClipCorpus.goldenLabels(spark, CorpusConfig(seed = 42L, n = n)).toDF()
      val members = golden.filter(col("cluster_id") >= 0)
      val goldenPairs = members.as("x").join(members.as("y"), "cluster_id")
        .filter(col("x.clip_id") < col("y.clip_id"))
        .select(col("x.clip_id").as("a"), col("y.clip_id").as("b"))
        .localCheckpoint(eager = false)
      val assign = res.clusters.select(col("node").as("clip_id"), col("component"))
        .localCheckpoint(eager = false)
      val found = goldenPairs
        .join(assign.withColumnRenamed("clip_id", "a").withColumnRenamed("component", "ca"), "a")
        .join(assign.withColumnRenamed("clip_id", "b").withColumnRenamed("component", "cb"), "b")
        .filter(col("ca") === col("cb"))
      val total = goldenPairs.count(); val hit = found.count()
      val predPairs = assign.as("x").join(assign.as("y"), "component")
        .filter(col("x.clip_id") < col("y.clip_id"))
        .select(col("x.clip_id").as("a"), col("y.clip_id").as("b"))
      val nPred = predPairs.count()
      val falsePos = predPairs.join(goldenPairs, Seq("a", "b"), "left_anti").count()
      println(f"[profile] recall@$n: ${hit.toDouble / total}%.4f ($hit/$total golden pairs co-clustered)")
      println(f"[profile] precision@$n: ${1.0 - falsePos.toDouble / math.max(1, nPred)}%.4f ($falsePos false of $nPred predicted)")
      // missed pairs by planted kind — names the tier that owns the tail
      val kinds = golden.select(col("clip_id"), col("kind"))
      val missed = goldenPairs.join(found.select("a", "b"), Seq("a", "b"), "left_anti")
        .localCheckpoint(eager = false)
      missed
        .join(kinds.withColumnRenamed("clip_id", "a").withColumnRenamed("kind", "ka"), "a")
        .join(kinds.withColumnRenamed("clip_id", "b").withColumnRenamed("kind", "kb"), "b")
        .groupBy("ka", "kb").count().orderBy(col("count").desc)
        .collect().foreach(r => println(
          s"[profile] missed ${r.getString(0)}~${r.getString(1)}: ${r.getLong(2)}"))
      // are misses below the verify floor (threshold tail) or above it
      // (candidate-generation miss)? true audio Jaccard per missed pair
      val jac = udf((x: Array[Long], y: Array[Long]) =>
        graft.operators.PairVerifier.jaccardLongJvm(x, y))
      val ash = res.signatures.select(col("clip_id"), col("ashingles"))
      val missJ = missed
        .join(ash.select(col("clip_id").as("a"), col("ashingles").as("_xa")), "a")
        .join(ash.select(col("clip_id").as("b"), col("ashingles").as("_xb")), "b")
        .select(jac(col("_xa"), col("_xb")).as("j"))
        .collect().map(_.getDouble(0)).sorted
      if (missJ.nonEmpty) println(
        f"[profile] missed-pair audio J: min ${missJ.head}%.3f  median ${missJ(missJ.length / 2)}%.3f  max ${missJ.last}%.3f  >=floor: ${missJ.count(_ >= rcfg.audioJaccardThreshold)}")
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "qtime") {
      // time named SparkEntry queries twice (cold+warm) against args(3) dir
      val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
      val names = if (args.length > 4) args(4).split(",").toSeq
        else Seq("q_minhash_sigs", "q_lsh_band_pairs", "q_containment_fp")
      val qmap = SparkEntry.queries
      names.foreach { nm =>
        (1 to 2).foreach { rep =>
          time(s"$nm#$rep")(qmap(nm)(spark, dir).count())
        }
      }
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "docsig") {
      import graft.functions.{Hashing, TextShingles}
      import graft.operators.MinHasher
      val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      def tsum(name: String, c: org.apache.spark.sql.Column): Unit =
        (1 to 2).foreach { r =>
          time(s"$name#$r")(docs.select(c.as("x")).agg(sum(hash(col("x")).cast("long"))).collect())
        }
      val grams = TextShingles.charGrams(col("t"), 5)
      tsum("charGrams", grams)
      tsum("gramsDistinct", array_distinct(grams))
      tsum("gramsMd5", transform(grams, Hashing.md5Hash31(_)))
      tsum("gramsXx", transform(grams, Hashing.fastHash31(_)))
      tsum("hashShingles", TextShingles.hashShingles(grams, portable = true))
      tsum("sigUdf", MinHasher.signatureUdf(32, 42L)(
        TextShingles.hashShingles(grams, portable = true)))
      // full query shapes
      val hashed = docs.select(col("doc_id"),
        TextShingles.hashShingles(TextShingles.charShingles(col("t"), 5),
          portable = true).as("sh"))
      val sigs = hashed.filter(size(col("sh")) > 0)
        .select(col("doc_id"), MinHasher.signatureUdf(32, 42L)(col("sh")).as("sig"))
      (1 to 2).foreach(r => time(s"sigs-count#$r")(sigs.count()))
      (1 to 2).foreach(r => time(s"sigs-explode-count#$r")(
        sigs.select(col("doc_id"), posexplode(col("sig"))).count()))
      (1 to 2).foreach(r => time(s"sigs-explode-order-count#$r")(
        sigs.select(col("doc_id"), posexplode(col("sig")).as(Seq("perm", "minh")))
          .orderBy("doc_id", "perm").count()))
      // with the string-level distinct the real query applies
      val hashed2 = docs.select(col("doc_id"),
        TextShingles.hashShingles(TextShingles.charShingles(col("t"), 5),
          portable = true).as("sh"))
      val sigs2 = hashed2.filter(size(col("sh")) > 0)
        .select(col("doc_id"), MinHasher.signatureUdf(32, 42L)(col("sh")).as("sig"))
      (1 to 2).foreach(r => time(s"sigs2-distinct-count#$r")(sigs2.count()))
      // the actual QueryDef fn, same session
      (1 to 2).foreach(r => time(s"real-q_minhash_sigs#$r")(
        graft.queries.TextDedup.minhashSigs.fn(spark, dir).count()))
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "sigcols") {
      import graft.functions.{AudioPcm, SimHash, TextShingles}
      import graft.operators.MinHasher
      val tsh = TextShingles.hashShingles(
        TextShingles.charShingles(lower(col("transcript")), cfg.charGramK), portable = false)
      val twsh = TextShingles.hashShingles(
        TextShingles.wordShingles(col("transcript"), cfg.textLshWordNgram), portable = false)
      val audio = AudioPcm.audioShingles(spark, col("bytes"), col("sr_hz"),
        cfg.frameMs, cfg.hopMs, cfg.framesPerShingle, cfg.energyLevels)
    val tSigUdf = MinHasher.signatureUdf(cfg.numPerms, cfg.seed)
      def tcount(name: String, c: org.apache.spark.sql.Column): Unit =
        time(name)(clips.select(c.as("x")).agg(sum(hash(col("x")).cast("long"))).collect())
      tcount("base-count", lit(1))
      tcount("sha2", sha2(col("bytes"), 256))
      tcount("tshingles", tsh)
      tcount("tshingles-size", size(tsh))
      tcount("twshingles", twsh)
      tcount("audio-shingles", audio)
      tcount("simhash", SimHash.simhash(spark, col("transcript")))
      tcount("minhash(tsh)", tSigUdf(tsh))
      tcount("minhash(audio)", tSigUdf(audio))
      time("all-sigs")(DedupPipeline.signatures(spark, clips, cfg)
        .agg(sum(hash(col("tsig"), col("asig"), col("sha"),
          col("simhash")).cast("long"))).collect())
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "buckets") {
      val sigs = DedupPipeline.signatures(spark, clips, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sigs.count()
      for ((name, sigCol, shCol, bands, rows) <- Seq(
        ("text", "tsig", "tshingles", cfg.bands, cfg.rowsPerBand),
        ("audio", "asig", "ashingles", cfg.audioBands, cfg.audioRowsPerBand))) {
        val s = sigs.filter(col(sigCol).isNotNull).select(col("clip_id"), col(sigCol).as("sig"))
        val keys = LshCandidates.bandKeys(s, "clip_id", bands, rows)
        val sizes = keys.groupBy("band", "bandVal").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
        val top = sizes.orderBy(col("n").desc).limit(10).collect()
        val pairMass = sizes.agg(sum((col("n") * (col("n") - 1) / 2).cast("long"))).first().getLong(0)
        println(s"[profile] $name buckets>1=${sizes.count()} pairMass=$pairMass top=" +
          top.map(r => s"${r.getLong(2)}").mkString(","))
        // sample candidate pairs: jaccard + planted-kind mix
        val (cands, _) = LshCandidates.candidatePairs(s, "clip_id", bands, rows, cfg.maxBucketSize)
        val jac = udf((x: Array[Long], y: Array[Long]) => PairVerifier.jaccardLongJvm(x, y))
        val sample = cands.limit(4000)
          .join(sigs.select(col("clip_id").as("a"), col(shCol).as("_sa")), "a")
          .join(sigs.select(col("clip_id").as("b"), col(shCol).as("_sb")), "b")
          .select(col("a"), col("b"), jac(col("_sa"), col("_sb")).as("j"))
          .collect()
        val hist = sample.groupBy(r => math.min(9, (r.getDouble(2) * 10).toInt))
          .view.mapValues(_.length).toMap
        println(s"[profile] $name cand-jaccard hist(decile->n): " +
          (0 to 9).map(d => s"$d:${hist.getOrElse(d, 0)}").mkString(" "))
        def kind(id: String): String = ClipCorpus.kindOf(42L, id.stripPrefix("clip_").toLong)
        val kinds = sample.take(2000).groupBy(r => (kind(r.getString(0)), kind(r.getString(1))))
          .view.mapValues(_.length).toSeq.sortBy(-_._2).take(8)
        println(s"[profile] $name cand kinds: $kinds")
      }
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "contain") {
      // containment-stage internals: candidate counts per tier
      val sigs = DedupPipeline.signatures(spark, clips, cfg).localCheckpoint(eager = true)
      val fps = sigs.select(col("clip_id"), explode(col("cfps")).as("fp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("fps-explode")(fps.count())
      println(s"[profile] fps rows=${fps.count()} distinct docs=${fps.select("clip_id").distinct().count()}")
      val sizes = fps.groupBy("fp").agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("fp-sizes")(sizes.count())
      println(s"[profile] buckets>1=${sizes.filter(col("n") > 1).count()} dropped=${sizes.filter(col("n") > cfg.containmentMaxBucket).count()} " +
        s"top=${sizes.orderBy(col("n").desc).limit(5).collect().map(_.getLong(1)).mkString(",")}")
      val kept = fps.join(sizes.filter(col("n") <= cfg.containmentMaxBucket), "fp")
      val cands = kept.select(col("fp"), col("clip_id").as("a"))
        .join(kept.select(col("fp"), col("clip_id").as("b")), "fp")
        .filter(col("a") < col("b"))
        .select("a", "b").dropDuplicates("a", "b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("contain-cands")(cands.count())
      println(s"[profile] contain cands=${cands.count()}")
      val txt = clips.select(col("clip_id"), lower(col("transcript")).as("_t"),
        ContainmentJoin.gramsUdf(lower(col("transcript"))).as("_g"))
      val w = cfg.containmentMinRun - ContainmentJoin.GramK + 1
      val joined = cands
        .join(txt.select(col("clip_id").as("a"), col("_t").as("_ta"), col("_g").as("_ga")), "a")
        .join(txt.select(col("clip_id").as("b"), col("_t").as("_tb"), col("_g").as("_gb")), "b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("cand-txt-join")(joined.count())
      val pre = joined.filter(ContainmentJoin.sharedUdf(col("_ga"), col("_gb")) >= w)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("gram-prefilter")(pre.count())
      println(s"[profile] prefilter survivors=${pre.count()}")
      time("lcs-dp")(pre.filter(
        ContainmentJoin.lcrUdf(col("_ta"), col("_tb")) >= cfg.containmentMinRun).count())
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "sized") {
      // sized-store regime (DedupStore.sized design point): the same corpus
      // and the same 20-clip delta, at B = 32 / 1024 / 4096 buckets. The
      // O(delta) story at thousands of buckets holds iff: merge wall stays
      // roughly FLAT in B (commit shuffles O(touched) write tasks — pinning
      // the shuffle to numBuckets made this O(B)), scheduled task count
      // stays flat, and the delta's written bytes FALL ~1/B (write
      // amplification is ~N/B rows per touched bucket).
      import graft.pipeline.{DedupStore, IncrementalDedup}
      def rmr(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
        f.delete(): Unit
      }
      def purge(): Unit = {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
      def dirBytes(p: java.nio.file.Path): Long =
        if (!java.nio.file.Files.exists(p)) 0L
        else {
          import scala.jdk.CollectionConverters._
          val s = java.nio.file.Files.walk(p)
          try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size).sum
          finally s.close()
        }
      val dn = 20L
      val delta = ClipCorpus.clipsRange(spark,
        CorpusConfig(seed = 42L, n = n + dn), n, n + dn).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      delta.count()
      val tasks = new java.util.concurrent.atomic.AtomicLong(0)
      // per-stage attribution: which call sites own the tasks (the O(delta)
      // claim fails exactly where a stage's task count tracks B instead)
      final case class St(site: String, nt: Int, wall: Long)
      val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, St]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet(): Unit
        }
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
          val site = si.details.split("\n").find(l =>
            l.contains("graft.") && !l.contains("Profile")).getOrElse(si.name.split("\n")(0)).trim.take(90)
          stageInfo.put(si.stageId, St(site, si.numTasks, wall))
        }
      })
      val tables = Seq("clips", "signatures", "dup_pairs", "clusters",
        "clusters_by_comp", "bands", "fps", "exact_keys")
      Seq(32, 1024, 4096).foreach { b =>
        val root = new java.io.File(SparkUtil.localDir, s"profile-sized-$n-$b")
        rmr(root)
        val store = new DedupStore(root.getAbsolutePath, b)
        time(s"initialize-$n-B$b")(
          IncrementalDedup.initialize(spark, clips, cfg, store))
        purge()
        tasks.set(0)
        stageInfo.clear()
        time(s"merge-$dn-B$b")(IncrementalDedup.merge(spark, delta, cfg, store))
        Thread.sleep(1000) // listener bus drain
        locally {
          import scala.jdk.CollectionConverters._
          // group stages by call site; a site whose task sum scales with B
          // is the remaining O(B) path
          stageInfo.asScala.values.groupBy(_.site).toSeq
            .map { case (site, ss) => (site, ss.map(_.nt).sum, ss.size, ss.map(_.wall).sum) }
            .sortBy(-_._2).take(12).foreach { case (site, nt, ns, w) =>
              println(f"[profile]   B=$b%-5d tasks=$nt%-6d stages=$ns%-3d wall-sum=${w / 1000.0}%7.2f s  $site")
            }
        }
        val v0 = tables.map(t => dirBytes(
          java.nio.file.Paths.get(root.getAbsolutePath, t, "data/v0"))).sum
        val v1 = tables.map(t => dirBytes(
          java.nio.file.Paths.get(root.getAbsolutePath, t, "data/v1"))).sum
        println(f"[profile] B=$b%-5d merge-tasks=${tasks.get}%-6d " +
          f"full-bytes=$v0%-10d delta-bytes=$v1%-9d rewrite-frac=${v1.toDouble / v0}%.4f")
        rmr(root)
      }
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "skew") {
      // hot-band straggler A/B: `hot` ids share band 0's minima (a silence
      // band / boilerplate transcript) while every other band value is
      // random — ONE kept bucket of size `hot` under the 2000 cap, whose
      // in-place expansion is hot^2/2 pairs generated by the single task
      // that aggregated the bucket. The salted path (cfg.lshSaltChunk) must
      // emit the same pairs with per-task generation bounded by chunk^2.
      // Usage: runMain graft.Profile [nBackground] [cores] skew [hotSize] [nHotGroups]
      // nHotGroups > 1 models the REAL at-scale pathology: many hot bands
      // hash onto few aggregation tasks and their quadratic expansions STACK
      // per task; salting spreads the stacked work uniformly.
      val hot = if (args.length > 3) args(3).toInt else 1800
      val nHot = if (args.length > 4) args(4).toInt else 1
      val P = cfg.numPerms
      val grp = floor((col("id") - n) / lit(hot)).cast("long")
      val sigsDf = spark.range(n + hot.toLong * nHot).select(
          format_string("c%08d", col("id")).as("clip_id"),
          transform(sequence(lit(0), lit(P - 1)), p =>
            when(col("id") >= n && p < lit(cfg.rowsPerBand),
              xxhash64(concat(lit("hot"), grp), p))
            .otherwise(xxhash64(col("id"), p))).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("skew-sigs")(sigsDf.count())
      val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
      val nTasks = new java.util.concurrent.atomic.AtomicLong(0)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          nTasks.incrementAndGet()
          maxTaskMs.getAndUpdate(m => math.max(m, e.taskInfo.duration)): Unit
        }
      })
      def runCase(name: String, chunk: Int): Long = {
        maxTaskMs.set(0); nTasks.set(0)
        val (pairs, _) = LshCandidates.fusedCandidatePairs(
          Seq(("text", sigsDf, cfg.bands, cfg.rowsPerBand)),
          "clip_id", cfg.maxBucketSize, chunk)
        val t0 = System.nanoTime()
        val np = pairs.count()
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener bus drain
        println(f"[profile] skew-$name%-8s pairs=$np%-9d wall=$w%6.2f s  " +
          f"max-task=${maxTaskMs.get / 1000.0}%6.2f s  tasks=${nTasks.get}")
        np
      }
      // alternate, 2 reps each: rep 1 is cold (corpus cache warm already),
      // rep 2 is the comparable number
      var nInPlace = 0L; var nSalted = 0L
      (1 to 2).foreach { _ =>
        nInPlace = runCase("inplace", Int.MaxValue)
        nSalted = runCase("salted", cfg.lshSaltChunk)
      }
      require(nInPlace == nSalted,
        s"salted expansion changed the pair set: $nInPlace != $nSalted")
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "merge") {
      // incremental-path latency vs store size: initialize an n-clip store,
      // then merge a 1% delta, re-merge it (no-op), and search 100 probes.
      // O(delta) holds if the merge/search times are store-size-flat-ish
      // (bucket-pruned reads) rather than proportional to n.
      import graft.pipeline.{ClipSearch, DedupStore, IncrementalDedup}
      val root = new java.io.File(SparkUtil.localDir, s"profile-store-$n")
      def rmr(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
        f.delete(): Unit
      }
      rmr(root)
      // default 32 buckets: a 20-row delta rewrites <= 20/32 of the row
      // tables — the demo's pruning granularity. More buckets sharpen the
      // pruning math but drown local runs in small-file overhead; at
      // 10^12 scale the file count is 10^5-10^6 and the same math prunes
      // 1M-row deltas to <1% of files.
      val store = new DedupStore(root.getAbsolutePath)
      val dn = 20L
      // purge leftover storage blocks between phases (leaked blocks inflate
      // a following phase ~2x via unified-memory eviction churn)
      def purge(): Unit = {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
      final case class St(rt: Long, cpu: Long, wall: Long, nt: Int)
      val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, St]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
          stageInfo.put(si.stageId, St(si.taskMetrics.executorRunTime,
            si.taskMetrics.executorCpuTime / 1000000, wall, si.numTasks))
        }
      })
      time(s"initialize-$n")(
        IncrementalDedup.initialize(spark, clips, cfg, store))
      purge()
      stageInfo.clear()
      val delta = ClipCorpus.clipsRange(spark, CorpusConfig(seed = 42L, n = n + dn), n, n + dn).toDF()
      time(s"merge-$dn-delta")(
        IncrementalDedup.merge(spark, delta, cfg, store))
      locally {
        import scala.jdk.CollectionConverters._
        val stages = stageInfo.asScala.toSeq
        println(f"[profile] merge stages=${stages.size} sum-wall=${stages.map(_._2.wall).sum / 1000.0}%.1f s sum-run=${stages.map(_._2.rt).sum / 1000.0}%.1f s sum-cpu=${stages.map(_._2.cpu).sum / 1000.0}%.1f s")
        stages.sortBy(-_._2.wall).take(14).foreach { case (id, s) =>
          println(f"[profile]   stage $id%4d wall ${s.wall / 1000.0}%7.2f s  run ${s.rt / 1000.0}%7.1f s  cpu ${s.cpu / 1000.0}%7.1f s  ${s.nt}%4d tasks")
        }
      }
      purge()
      time(s"merge-$dn-noop")(
        IncrementalDedup.merge(spark, delta, cfg, store))
      val probes = ClipCorpus.clipsRange(spark,
        CorpusConfig(seed = 99L, n = 5L), 0L, 5L).toDF()
        .withColumn("clip_id", concat(lit("probe_"), col("clip_id")))
      time("search-5-probes")(
        ClipSearch.search(spark, probes, store, cfg, k = 5).count())
      rmr(root)
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "floor") {
      // Serial-floor attribution: the probe leg's shape (AQE off, coalescing
      // off, fixed shuffle partitions, metrics off) at a near-zero-work
      // corpus, with a job-level timeline. The floor is what Amdahl charges
      // against the scaling probe's raw efficiency; this prints where it
      // lives: per-job wall (executor-side) vs the GAPS between jobs (pure
      // driver planning/optimization/broadcast-build time).
      spark.stop()
      val parts = if (args.length > 3) args(3).toInt else 8
      val s2 = SparkUtil.session(cores, "graft-floor", aqe = Some(false),
        shufflePartitions = Some(parts), aqeCoalesce = Some(false))
      final case class J(id: Int, desc: String, t0: Long, var t1: Long)
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
      s2.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          // name the job by its stages' graft call sites (callSite.short is
          // empty for jobs launched from Spark's exchange threads)
          val d0 = e.stageInfos.flatMap(_.details.split("\n")
              .find(l => l.contains("graft.") && !l.contains("Profile")))
            .map(_.trim.take(70)).distinct.mkString(" | ")
          val d = if (d0.nonEmpty) d0
            else e.stageInfos.map(si => si.name.split("\n")(0).take(70))
              .distinct.mkString(" | ")
          jobs.put(e.jobId, J(e.jobId, d, e.time, -1L)): Unit
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.get(e.jobId)).foreach(_.t1 = e.time)
        }
      })
      val c2 = ClipCorpus.clips(s2, CorpusConfig(seed = 42L, n = n)).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c2.count()
      // warm run (JIT/codegen), then the timed run — like the probe's JVM
      // state after its first leg
      DedupPipeline.run(s2, c2, cfg.copy(collectMetrics = false)).clusters.count()
      s2.sharedState.cacheManager.clearCache()
      s2.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      c2.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c2.count()
      Thread.sleep(300)
      jobs.clear()
      val t0 = System.nanoTime()
      DedupPipeline.run(s2, c2, cfg.copy(collectMetrics = false)).clusters.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.t0)
      val sumJob = js.map(j => math.max(0L, j.t1 - j.t0)).sum / 1000.0
      val gaps = (js.sliding(2).collect {
        case Seq(a, b) => math.max(0L, b.t0 - a.t1)
      }).sum / 1000.0
      println(f"[profile] floor n=$n cores=$cores parts=$parts wall=$wall%.2f s jobs=${js.size} sum-job-wall=$sumJob%.2f s inter-job-gaps=$gaps%.2f s")
      var prevEnd = js.headOption.map(_.t0).getOrElse(0L)
      js.foreach { j =>
        val gap = math.max(0L, j.t0 - prevEnd) / 1000.0
        println(f"[profile]   job ${j.id}%3d gap $gap%6.3f s  wall ${math.max(0L, j.t1 - j.t0) / 1000.0}%6.3f s  ${j.desc}")
        prevEnd = math.max(prevEnd, j.t1)
      }
      s2.stop()
      return
    }

    if (args.length > 2 && args(2) == "full") {
      // job-level wall times + task-time sums: where serial/driver time hides.
      // Per stage: wall, executor run time, CPU time, GC time, call site —
      // runTime >> cpuTime+gcTime means threads blocked (lock/IO), high GC
      // means allocation storm, and the call site names the operator.
      final case class St(name: String, site: String, rt: Long, cpu: Long,
                          gc: Long, wall: Long, nt: Int)
      val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, St]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
          val site = si.details.split("\n").find(l =>
            l.contains("graft.") && !l.contains("Profile")).getOrElse("").trim.take(100)
          stageInfo.put(si.stageId, St(si.name.split("\n")(0).take(60), site,
            si.taskMetrics.executorRunTime, si.taskMetrics.executorCpuTime / 1000000,
            si.taskMetrics.jvmGCTime, wall, si.numTasks))
        }
      })
      def report(label: String): Unit = {
        import scala.jdk.CollectionConverters._
        val stages = stageInfo.asScala.toSeq
        println(f"[profile] $label stages=${stages.size} sum-task-time=${stages.map(_._2.rt).sum / 1000.0}%.1f s sum-cpu=${stages.map(_._2.cpu).sum / 1000.0}%.1f s sum-gc=${stages.map(_._2.gc).sum / 1000.0}%.1f s")
        stages.sortBy(-_._2.wall).take(16).foreach { case (id, s) =>
          println(f"[profile]   stage $id%4d wall ${s.wall / 1000.0}%7.2f s  run ${s.rt / 1000.0}%8.1f s  cpu ${s.cpu / 1000.0}%8.1f s  gc ${s.gc / 1000.0}%6.1f s  ${s.nt}%4d tasks  ${s.name}  ${s.site}")
        }
        stageInfo.clear()
      }
      time("full-run-1")(DedupPipeline.run(spark, clips, cfg).clusters.count())
      report("run-1")
      // purge ALL persistent RDDs (incl. localCheckpoint blocks) so run-2
      // measures the engine, not run-1's leftover-block eviction churn;
      // re-cache the corpus like run-1 had it
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      clips.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      clips.count()
      time("full-run-2")(DedupPipeline.run(spark, clips, cfg).clusters.count())
      report("run-2")
      spark.stop()
      return
    }

    // default mode mirrors the REAL pipeline stage-for-stage (fused band
    // self-join, precomputed winnowing fingerprints, persisted branches) so
    // each timing is that stage's cost, not a recompute artifact
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sigs = DedupPipeline.signatures(spark, clips, cfg).localCheckpoint(eager = false)
    time("signatures")(sigs.count())

    val (cands, _) = LshCandidates.fusedCandidatePairs(Seq(
      ("text", sigs.filter(col("tsig").isNotNull)
        .select(col("clip_id"), col("tsig").as("sig")), cfg.bands, cfg.rowsPerBand),
      ("audio", sigs.filter(col("asig").isNotNull)
        .select(col("clip_id"), col("asig").as("sig")), cfg.audioBands, cfg.audioRowsPerBand)),
      "clip_id", cfg.maxBucketSize, cfg.lshSaltChunk)
    val candsP = cands.persist(MEMORY_AND_DISK)
    time("fused-candidates")(candsP.count())
    val tCands = candsP.filter(col("modality") === "text").select("a", "b")
    val aCands = candsP.filter(col("modality") === "audio").select("a", "b")
    val tc = tCands.count(); val ac = aCands.count()

    val tshFeatures = clips.select(col("clip_id"),
      DedupPipeline.textShingleCol(cfg).as("tshingles"))
    val textPairs = PairVerifier.verify(tCands, tshFeatures, "clip_id", "tshingles",
      cfg.textJaccardThreshold, "text_minhash").persist(MEMORY_AND_DISK)
    time("text-verify")(textPairs.count())

    val aPlausible = PairVerifier.estimateScreen(aCands, sigs, "clip_id", "asig",
      cfg.audioEstimateMin)
    val audioScreened = PairVerifier.verify(aPlausible, sigs, "clip_id", "ashingles",
      cfg.audioJaccardThreshold, "audio_minhash").persist(MEMORY_AND_DISK)
    time("audio-verify")(audioScreened.count())
    val audioPairs = PairVerifier.pcmConfirm(audioScreened, clips, "clip_id", cfg.pcmCorrMin)
      .persist(MEMORY_AND_DISK)
    time("audio-pcm-confirm")(audioPairs.count())

    val containPairs = ContainmentJoin.pairsFromFps(
      sigs.select(col("clip_id"), explode(col("cfps")).as("fp")),
      clips.select(col("clip_id"), lower(col("transcript")).as("_lt")),
      "clip_id", "_lt", cfg).persist(MEMORY_AND_DISK)
    time("containment")(containPairs.count())

    val dupPairs = textPairs.select("a", "b")
      .union(audioPairs.select("a", "b")).union(containPairs.select("a", "b"))
      .dropDuplicates("a", "b").persist(MEMORY_AND_DISK)
    val np = time("dup-pairs-union")(dupPairs.count())
    time("cc")(ConnectedComponents.clusters(dupPairs, cfg.minClusterSize, np).count())
    println(s"[profile] text cands=$tc audio cands=$ac pairs=$np")
    time("full-run-again")(DedupPipeline.run(spark, clips, cfg).clusters.count())
    spark.stop()
  }
}
