package graft.kg

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.link.{Blocking, ConnectedComponents}

class KgSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- Html ---------------------------------------------------------------

  test("extractor inverts the page template byte-identically for every page (invariant)") {
    val pages = Corpus.pages(spark, sf1)
    val bad = pages.map(p => if (Html.extract(p.html) == p.text) 0 else 1)
      .reduce(_ + _)
    assert(bad === 0)
    assert(pages.count() === 500L)
  }

  test("extractor handles entities, numeric refs, comments, nested noise") {
    val html = "<html><head><title>t</title></head><body><!-- c --><nav>x</nav>" +
      "<article><p>a &amp;lt; b &#233; &#x41;</p><p>c&gt;d</p></article>" +
      "<script>var x='<p>no</p>';</script><footer>f</footer></body></html>"
    assert(Html.extract(html) === "a &lt; b é A\n\nc>d")
  }

  // ---- AhoCorasick --------------------------------------------------------

  test("aho-corasick finds word-boundary leftmost-longest matches") {
    val ac = new AhoCorasick(Array("entity 1", "entity 10", "shared widget 5"))
    val text = "x entity 10 y shared widget 5 z entity 1."
    val found = ac.findMentions(text).map { case (s, e, i) => text.substring(s, e) }
    assert(found === Seq("entity 10", "shared widget 5", "entity 1"))
    // no boundary match inside a longer token
    assert(new AhoCorasick(Array("inc")).findMentions("incorporated").isEmpty)
  }

  // ---- Blocking + CC ------------------------------------------------------

  test("duplicate-entity edges are exactly the planted groups, via exact+LSH+rare-token") {
    val dict = Corpus.aliasDict(spark).as[AliasRow]
    val got = Blocking.duplicateEntityEdges(spark, dict)
      .collect().map(p => (p.a, p.b)).toSet
    val expected = (0 until 200)
      .map(g => (Corpus.entityId(g), Corpus.entityId(g + 800))).toSet
    assert(got === expected)
  }

  test("local (driver) blocking path agrees with the distributed Dataset path") {
    val dict = Corpus.aliasDict(spark).as[AliasRow]
    val dist = Blocking.duplicateEntityEdges(spark, dict)
      .collect().map(p => (p.a, p.b)).toSet
    val local = Blocking.duplicateEntityEdgesLocal(Corpus.aliasRows)
      .map(p => (p.a, p.b)).toSet
    assert(local === dist)
  }

  test("distributed large-star/small-star CC agrees with the driver union-find path") {
    val edges = Seq(("b", "a"), ("c", "b"), ("d", "c"), ("x", "z"), ("y", "z"))
      .toDF("u", "v")
    val nodes = Seq("a", "b", "c", "d", "x", "y", "z", "lone").toDF("id")
    val viaLoop = ConnectedComponents.runDistributed(spark, edges, nodes)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaDriver = ConnectedComponents.run(spark, edges, nodes)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaLoop === viaDriver)
  }

  test("LSH banding alone finds most near-dup pairs (it's a candidate path, not the recall guarantee)") {
    val dict = Corpus.aliasDict(spark).as[AliasRow]
    val lsh = Blocking.lshCandidates(spark, dict)
      .as[(String, String, String, String)]
      .collect()
      .filter(r => Blocking.jaccard(r._1, r._3) >= 0.5)
      .map(r => (r._2, r._4)).toSet
    val planted = (100 until 200)
      .map(g => (Corpus.entityId(g), Corpus.entityId(g + 800))).toSet
    assert(lsh.intersect(planted).size >= (planted.size * 0.8).toInt)
  }

  test("large-star/small-star CC canonicalizes chains, stars and singletons") {
    val edges = Seq(
      ("b", "a"), ("c", "b"), ("d", "c"),   // chain a-b-c-d
      ("x", "z"), ("y", "z"),               // star center z
      ("p", "q")).toDF("u", "v")
    val nodes = Seq("a", "b", "c", "d", "x", "y", "z", "p", "q", "lone").toDF("id")
    val got = ConnectedComponents.run(spark, edges, nodes)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "x", "p" -> "p", "q" -> "p",
      "lone" -> "lone"))
  }

  test("CC on the alias dictionary matches the arithmetic canonical assignment") {
    val dict = Corpus.aliasDict(spark).as[AliasRow]
    val dup = Blocking.duplicateEntityEdges(spark, dict).toDF("u", "v")
    val all = Corpus.aliasRows.map(_.entity_id).distinct.toDF("id")
    val got = ConnectedComponents.run(spark, dup, all)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (0 until 1000).foreach { k =>
      assert(got(Corpus.entityId(k)) === Corpus.entityId(Corpus.canonicalOf(k)),
        s"entity $k")
    }
  }

  test("fused single-pass facts == unfused mentions+links and triples paths") {
    val texts = Extract.pageText(Corpus.pages(spark, sf1))
      .filter(_.lang == "en")
    val dict = Corpus.aliasRows
    val fused = Extract.facts(spark, texts, dict, Corpus.predicates).collect()
    val fusedLinks = fused.filter(_.kind == 0)
      .map(f => (f.url, f.start, f.end, f.a)).toSet
    val fusedTriples = fused.filter(_.kind == 1)
      .map(f => (f.url, f.a, f.pred, f.obj)).toSet
    val ments = Extract.mentions(spark, texts, dict.map(_.alias))
    val links = Extract.links(spark, ments, dict).collect()
      .map(l => (l.url, l.start, l.end, l.entity_id)).toSet
    val triples = Extract.triples(spark, texts, dict, Corpus.predicates)
      .collect().map(t => (t.url, t.subj, t.pred, t.obj)).toSet
    assert(fusedLinks === links)
    assert(fusedTriples === triples)
  }

  // ---- Mentions / triples vs planted oracle -------------------------------

  private def expectedTriples(): Set[(String, String, String, String)] = {
    val docs = spark.read.parquet(s"$sf1/documents.parquet")
      .filter($"lang" === "en").select("doc_id").as[Long].collect()
    docs.map { i =>
      val s = Corpus.canonicalOf((i % 1000).toInt)
      val o = Corpus.canonicalOf(((7 * i + 3) % 1000).toInt)
      val p = Corpus.predicates((i % 5).toInt)._1
      (Corpus.urlOf(i), Corpus.entityId(s), p, Corpus.entityId(o))
    }.toSet
  }

  test("end-to-end pipeline emits exactly the planted canonical triples (P=R=1.0)") {
    val work = Files.createTempDirectory("kgpipe").toString
    val pipe = new KgPipeline(spark, work)
    val res = pipe.run(Corpus.pages(spark, sf1), Corpus.aliasRows, 100L,
      mergeGraph = false)
    val got = res.triples.select("url", "subj", "pred", "obj")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    val exp = expectedTriples()
    val precision = got.intersect(exp).size.toDouble / got.size
    val recall = got.intersect(exp).size.toDouble / exp.size
    info(f"P=$precision%.4f R=$recall%.4f (target >= 0.95)")
    assert(precision === 1.0 && recall === 1.0,
      s"missing=${exp.diff(got).take(3)} extra=${got.diff(exp).take(3)}")
  }

  test("table-native dictionary: parquet-backed Dataset[AliasRow] run equals the Seq run") {
    val dictPath = Files.createTempDirectory("kgdict").toString + "/aliases.parquet"
    Corpus.aliasRows.toDF().write.parquet(dictPath)
    val dictDs = spark.read.parquet(dictPath).as[AliasRow]

    val work = Files.createTempDirectory("kgpipeds").toString
    val pipe = new KgPipeline(spark, work)
    val res = pipe.run(Corpus.pages(spark, sf1), dictDs, 100L, mergeGraph = false)
    val got = res.triples.select("url", "subj", "pred", "obj")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got === expectedTriples(), "Dataset-dict run must emit the planted triples")

    // over-cap dictionaries no longer error: they take the sharded
    // automaton path (pinned end-to-end by ExtractShardSpec); here just
    // pin that the under-cap probe stays on the broadcast path
    assert(KgPipeline.boundedCollectOpt(dictDs).isDefined)
  }

  test("pipeline resumes: committed stages are not recomputed on re-run") {
    val work = Files.createTempDirectory("kgresume").toString
    val pipe = new KgPipeline(spark, work)
    val pages = Corpus.pages(spark, sf1)
    pipe.run(pages, Corpus.aliasRows, 100L, mergeGraph = false)
    val vBefore = graft.snapshot.SnapshotTable(spark, s"$work/stage_facts", None).latestVersion
    // simulate restart: new pipeline object, same work dir + tag
    val pipe2 = new KgPipeline(spark, work)
    assert(pipe2.stageDone("facts", 100L))
    val res2 = pipe2.run(pages, Corpus.aliasRows, 100L, mergeGraph = false)
    val vAfter = graft.snapshot.SnapshotTable(spark, s"$work/stage_facts", None).latestVersion
    assert(vBefore === vAfter, "stage must not be recommitted on resume")
    assert(res2.triples.count() > 0)
    // a NEW tag recomputes
    assert(!pipe2.stageDone("facts", 200L))
  }

  test("graph merge stage materializes Entity/Page nodes and MENTIONS/predicate edges") {
    val work = Files.createTempDirectory("kgmerge").toString
    val pipe = new KgPipeline(spark, work)
    pipe.run(Corpus.pages(spark, sf1), Corpus.aliasRows, 100L, mergeGraph = true)
    val nodeCounts = pipe.nodes.read().groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nodeCounts("Page") === 500L)
    assert(nodeCounts("Entity") === 800L)  // canonical space
    val relLabels = pipe.edges.read().select("rel_label").distinct()
      .collect().map(_.getString(0)).toSet
    assert(relLabels.contains("MENTIONS"))
    assert(Corpus.predicates.map(_._1).toSet.subsetOf(relLabels - "MENTIONS") ||
      Corpus.predicates.map(_._1).exists(relLabels.contains))
    // lineage rows exist for each stage
    val stages = pipe.lineageRows().select("stage").distinct()
      .collect().map(_.getString(0)).toSet
    assert(Set("pages", "extract", "links", "canonical", "triples").subsetOf(stages))
  }
}
