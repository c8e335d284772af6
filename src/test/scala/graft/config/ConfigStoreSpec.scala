package graft.config

import graft.SparkSpec

class ConfigStoreSpec extends SparkSpec {

  private val store = ConfigStore(
    "/" -> ConfigNode(Map("retention.k" -> "3", "owner" -> "infra")),
    "/tags/hot" -> ConfigNode(Map("retention.k" -> "6", "tier" -> "ssd")),
    "/tags/cold" -> ConfigNode(Map("retention.k" -> "1")),
    "/datasets" -> ConfigNode(Map("owner" -> "data-eng")),
    "/datasets/click" -> ConfigNode(imports = Seq("/tags/hot")),
    "/datasets/error" -> ConfigNode(Map("retention.k" -> "2"),
      imports = Seq("/tags/hot")),
    "/datasets/view" -> ConfigNode())

  test("own keys override imports, imports override the parent chain") {
    val click = store.resolve("/datasets/click")
    assert(click("retention.k") == "6")       // from imported tag
    assert(click("tier") == "ssd")            // tag-only key
    // an import resolves RECURSIVELY (including its own ancestor chain)
    // before the dataset's parent chain is consulted — so root's owner
    // arrives at import precedence and beats /datasets' owner, exactly
    // as ConfigStoreBackedValueInspector.java:127-138 orders fallbacks
    assert(click("owner") == "infra")
    val err = store.resolve("/datasets/error")
    assert(err("retention.k") == "2")         // own beats import
    val view = store.resolve("/datasets/view")
    assert(view("retention.k") == "3")        // root default
    assert(view("owner") == "data-eng")
  }

  test("undeclared path still inherits its ancestor chain") {
    val p = store.resolve("/datasets/brand-new")
    assert(p("retention.k") == "3" && p("owner") == "data-eng")
  }

  test("earlier imports take precedence over later ones") {
    val s = ConfigStore(
      "/tags/a" -> ConfigNode(Map("x" -> "a", "only_a" -> "1")),
      "/tags/b" -> ConfigNode(Map("x" -> "b", "only_b" -> "2")),
      "/d" -> ConfigNode(imports = Seq("/tags/a", "/tags/b")))
    val r = s.resolve("/d")
    assert(r("x") == "a" && r("only_a") == "1" && r("only_b") == "2")
  }

  test("import cycles terminate, first occurrence wins") {
    val s = ConfigStore(
      "/a" -> ConfigNode(Map("k" -> "a"), imports = Seq("/b")),
      "/b" -> ConfigNode(Map("k" -> "b", "bk" -> "1"), imports = Seq("/a")))
    val r = s.resolve("/a")
    assert(r("k") == "a" && r("bk") == "1")
    assert(s.resolve("/b")("k") == "b")
  }

  test("childrenOf / resolveAll enumerate declared datasets only") {
    assert(store.childrenOf("/datasets") ==
      Seq("/datasets/click", "/datasets/error", "/datasets/view"))
    val all = store.resolveAll("/datasets")
    assert(all.keySet == Set("click", "error", "view"))
    assert(all("click")("retention.k") == "6")
  }

  test("fromFs loads the reference's main.conf/includes.conf tree layout") {
    import java.nio.file.{Files, Paths}
    val root = tmpDir("cfg-store")
    def put(rel: String, name: String, lines: Seq[String]): Unit = {
      val d = Paths.get(root, rel)
      Files.createDirectories(d)
      Files.write(d.resolve(name), lines.mkString("\n").getBytes("UTF-8")): Unit
    }
    put("", "main.conf", Seq("retention.k = 3", "# a comment", "owner=infra"))
    put("tags/hot", "main.conf", Seq("retention.k=6", "tier=ssd"))
    put("tags/cold", "main.conf", Seq("retention.k=1", "tier=hdd"))
    put("datasets/click", "includes.conf",
      // the reference REVERSES includes: the LAST line wins ties
      Seq("/tags/cold", "", "// trailing comment", "/tags/hot"))
    put("datasets/logs", "main.conf", Seq("retention.k=9"))

    val fsStore = ConfigStore.fromFs(spark, root)
    val click = fsStore.resolve("/datasets/click")
    assert(click("retention.k") == "6")   // hot (last include) beats cold
    assert(click("tier") == "ssd")
    assert(fsStore.resolve("/datasets/click")("owner") == "infra")
    assert(fsStore.resolve("/datasets/logs")("retention.k") == "9")
    assert(fsStore.resolve("/datasets/unknown")("retention.k") == "3")
    assert(fsStore.childrenOf("/datasets") ==
      Seq("/datasets/click", "/datasets/logs"))
  }

  test("newestKPerDataset applies dataset-scoped K in one pass") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val versions = (1 to 10).flatMap(v =>
      Seq(("click", v), ("view", v), ("undeclared", v)))
      .toDF("dataset", "v")
    val policy = ConfigPolicies.newestKTable(spark,
      store.resolveAll("/datasets"), "retention.k", default = 3)
    val kept = ConfigPolicies.newestKPerDataset(
      policy, "dataset", Seq(col("v").desc), default = 3)(versions)
      .groupBy("dataset").agg(count(lit(1)).as("n"), min("v").as("oldest"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(kept("click") == ((6L, 5)))      // tag-scoped K=6
    assert(kept("view") == ((3L, 8)))       // root default K=3
    assert(kept("undeclared") == ((3L, 8))) // not in store -> default
  }
}
