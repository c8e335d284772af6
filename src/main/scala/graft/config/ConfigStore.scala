package graft.config

/** Dataset-scoped configuration store with tag inheritance — the
  * reference's config-management core (gobblin-config-management/
  * gobblin-config-core/.../ConfigStoreBackedValueInspector.java:107-141
  * getResolvedConfigRecursive; ConfigClient.java is the lookup façade):
  * a tree of config nodes where a node's effective config is
  *
  *   own keys  >  imports (in declared order, resolved recursively)
  *             >  parent chain (resolved recursively)
  *
  * with a SINGLE visited set across the whole resolution, so each path
  * contributes exactly once at its first (highest-precedence) occurrence
  * and import cycles terminate instead of recursing (the reference
  * returns an empty config on re-visit — ValueInspector:118-120).
  * "Tags" are ordinary nodes (conventionally under /tags) that datasets
  * import — one retention/copy policy subtree can govern thousands of
  * datasets, edited in one place.
  *
  * This is metadata-plane, driver-side state: O(nodes), never O(data).
  * The resolved per-dataset properties feed plan-time constructs — a
  * broadcast policy table, a [[graft.pipeline.PipelineSpec]], a
  * [[graft.operators.Retention]] selector — so dataset count never adds
  * distributed work beyond the one small join that applies the policy.
  */
final case class ConfigNode(props: Map[String, String] = Map.empty,
                            imports: Seq[String] = Nil)

final class ConfigStore(nodes: Map[String, ConfigNode]) {
  import ConfigStore.normalize

  private def parentOf(p: String): String = {
    val i = p.lastIndexOf('/')
    if (i <= 0) "/" else p.substring(0, i)
  }

  private def own(p: String): ConfigNode =
    nodes.getOrElse(p, ConfigNode())

  /** Effective config at `path` (own > imports > parent, cycle-safe). */
  def resolve(path: String): Map[String, String] = {
    val visited = scala.collection.mutable.Set.empty[String]
    def rec(p: String): Map[String, String] = {
      if (!visited.add(p)) return Map.empty
      val node = own(p)
      if (p == "/") return node.props
      // withFallback chain: later maps only fill keys still missing
      val withImports = node.imports.map(normalize).foldLeft(node.props) {
        (acc, imp) => rec(imp) ++ acc
      }
      rec(parentOf(p)) ++ withImports
    }
    rec(normalize(path))
  }

  /** Declared nodes strictly under `prefix` (the config store's own
    * children — never inferred from data). */
  def childrenOf(prefix: String): Seq[String] = {
    val base = normalize(prefix)
    val baseSlash = if (base == "/") "/" else base + "/"
    nodes.keys.filter(k => k != base && k.startsWith(baseSlash)).toSeq.sorted
  }

  /** Resolve every declared dataset under `prefix`:
    * dataset leaf name -> effective properties. */
  def resolveAll(prefix: String): Map[String, Map[String, String]] =
    childrenOf(prefix).map { p =>
      p.substring(p.lastIndexOf('/') + 1) -> resolve(p)
    }.toMap
}

object ConfigStore {
  private[config] def normalize(p: String): String =
    if (p == "/") "/"
    else "/" + p.split('/').filter(_.nonEmpty).mkString("/")

  /** Build from flat "path -> node" pairs; paths are normalized. */
  def apply(entries: (String, ConfigNode)*): ConfigStore =
    new ConfigStore(entries.map { case (p, n) => normalize(p) -> n }.toMap)

  /** Load a persisted store from a filesystem tree — the reference's
    * SimpleHadoopFilesystemConfigStore layout
    * (gobblin-config-core/.../store/hdfs/
    * SimpleHadoopFilesystemConfigStore.java:127-129): every directory
    * under `root` is a config node; its own keys live in `main.conf`
    * (key=value lines, # / // comments), its imports in `includes.conf`
    * (one path per line, root-relative). The reference REVERSES the
    * includes list (SimpleHadoopFilesystemConfigStore.java:289: later
    * lines in the file take precedence), and so does this loader.
    * One metadata walk of O(nodes) — config trees are small by design. */
  def fromFs(spark: org.apache.spark.sql.SparkSession,
             root: String): ConfigStore = {
    import org.apache.hadoop.fs.Path
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(rootPath).toUri

    def readLines(p: Path): Seq[String] =
      if (!fs.exists(p)) Nil
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
    def clean(lines: Seq[String]): Seq[String] = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("//"))

    def nodeAt(dir: Path): ConfigNode = {
      val props = clean(readLines(new Path(dir, "main.conf"))).flatMap { l =>
        val i = l.indexOf('=')
        if (i <= 0) None else Some(l.take(i).trim -> l.drop(i + 1).trim)
      }.toMap
      val imports = clean(readLines(new Path(dir, "includes.conf")))
        .reverse.map(normalize)
      ConfigNode(props, imports)
    }

    def walk(dir: Path): Seq[(String, ConfigNode)] = {
      val rel = rootUri.relativize(fs.makeQualified(dir).toUri).getPath
      val key = normalize("/" + rel)
      val children = fs.listStatus(dir).toSeq.filter(_.isDirectory)
        .flatMap(st => walk(st.getPath))
      (key -> nodeAt(dir)) +: children
    }

    new ConfigStore(walk(rootPath).toMap)
  }
}
