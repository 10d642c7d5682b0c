package graft.config

/** AI-pipeline configuration (reference: config.py:11-191).
  *
  * Same shape as the reference's pydantic models; loading replicates its two
  * mechanisms: a YAML document deep-merged over defaults (config.py:123-129)
  * and `CPS_`-prefixed env overrides with `__` nesting + primitive coercion
  * (config.py:132-169, C28). Only the YAML subset the reference's own config
  * files use (nested maps + scalars) is parsed — no external YAML dependency.
  */
case class NerConfig(
    enabled: Boolean = true,
    provider: String = "presidio",
    confidenceMin: Double = 0.60,
    language: String = "en",
    spacyModel: Option[String] = None)

case class EnsembleConfig(
    wRule: Double = 0.4, wNer: Double = 0.3, wEmbed: Double = 0.3, // config defaults (config.py:45-47)
    decisionThreshold: Double = 0.55)

case class LlmConfig( // schema only; never called at runtime (M9)
    enabled: Boolean = false,
    provider: String = "none",
    costCapUsdPerScan: Double = 0.50,
    cacheTtlMinutes: Int = 1440)

case class AiConfig(
    mode: String = "balanced",
    ner: NerConfig = NerConfig(),
    ensemble: EnsembleConfig = EnsembleConfig(),
    llm: LlmConfig = LlmConfig())

object Config {

  /** Parse the nested-map YAML subset: `key: value` lines, 2-space indent
    * nesting, comments, quoted strings. Unknown keys are rejected like
    * pydantic's extra=forbid. */
  def parseYaml(text: String): Map[String, Any] = {
    val root = scala.collection.mutable.LinkedHashMap[String, Any]()
    val stack = scala.collection.mutable.ArrayBuffer[(Int, scala.collection.mutable.LinkedHashMap[String, Any])]((-1, root))
    for (raw <- text.linesIterator) {
      val noComment = raw.takeWhile(_ != '#')
      val line = noComment.replaceAll("\\s+$", "")
      if (line.trim.nonEmpty) {
        val indent = line.takeWhile(_ == ' ').length
        val body = line.trim
        val idx = body.indexOf(':')
        require(idx > 0, s"unparseable config line: $raw")
        val key = body.substring(0, idx).trim
        val value = body.substring(idx + 1).trim
        while (stack.last._1 >= indent) stack.remove(stack.size - 1)
        val parent = stack.last._2
        if (value.isEmpty) {
          val child = scala.collection.mutable.LinkedHashMap[String, Any]()
          parent(key) = child
          stack += ((indent, child))
        } else parent(key) = coerce(stripQuotes(value))
      }
    }
    deepImmutable(root)
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\''))) s.substring(1, s.length - 1)
    else s

  /** Primitive coercion (config.py:150-164): true/1/yes/on → bool; contains
    * '.' → float; else int; else string. */
  def coerce(v: String): Any = {
    val low = v.toLowerCase
    if (Seq("true", "yes", "on").contains(low)) true
    else if (Seq("false", "no", "off").contains(low)) false
    else if (v.contains('.')) try v.toDouble catch { case _: NumberFormatException => v }
    else try v.toInt catch { case _: NumberFormatException => v }
  }

  /** Deep merge: override wins; nested maps merge recursively (config.py:123-129). */
  def deepMerge(base: Map[String, Any], over: Map[String, Any]): Map[String, Any] =
    (base.keySet ++ over.keySet).map { k =>
      (base.get(k), over.get(k)) match {
        case (Some(b: Map[String @unchecked, Any @unchecked]), Some(o: Map[String @unchecked, Any @unchecked])) =>
          k -> deepMerge(b, o)
        case (_, Some(o)) => k -> o
        case (Some(b), None) => k -> b
        case _ => k -> null
      }
    }.toMap

  /** `CPS_AI__NER__ENABLED=true` → Map("ai" -> Map("ner" -> Map("enabled" -> true)))
    * (config.py:132-148). */
  def envOverrides(env: Map[String, String], prefix: String = "CPS_"): Map[String, Any] = {
    env.filter(_._1.startsWith(prefix)).foldLeft(Map.empty[String, Any]) { case (acc, (k, v)) =>
      val path = k.stripPrefix(prefix).toLowerCase.split("__").toSeq
      def nest(p: Seq[String]): Map[String, Any] =
        if (p.size == 1) Map(p.head -> coerce(v))
        else Map(p.head -> nest(p.tail))
      deepMerge(acc, nest(path))
    }
  }

  private def deepImmutable(m: scala.collection.mutable.LinkedHashMap[String, Any]): Map[String, Any] =
    m.map {
      case (k, v: scala.collection.mutable.LinkedHashMap[String @unchecked, Any @unchecked]) => k -> deepImmutable(v)
      case (k, v) => k -> v
    }.toMap

  private val knownKeys: Map[String, Set[String]] = Map(
    "" -> Set("ai"),
    "ai" -> Set("mode", "ner", "ensemble", "llm"),
    "ai.ner" -> Set("enabled", "provider", "confidence_min", "language", "spacy_model"),
    "ai.ensemble" -> Set("weights", "decision_threshold"),
    "ai.ensemble.weights" -> Set("rules", "ner", "embeddings"),
    "ai.llm" -> Set("enabled", "provider", "cost_cap_usd_per_scan", "cache_ttl_minutes"))

  /** Strict validation: unknown keys anywhere reject the config
    * (pydantic extra=forbid parity, config.py:14). */
  def validateKeys(m: Map[String, Any], path: String = ""): Unit = {
    knownKeys.get(path).foreach { allowed =>
      val bad = m.keySet.diff(allowed)
      require(bad.isEmpty, s"unknown config keys at '$path': ${bad.mkString(",")}")
    }
    m.foreach {
      case (k, v: Map[String @unchecked, Any @unchecked]) =>
        validateKeys(v, if (path.isEmpty) k else s"$path.$k")
      case _ =>
    }
  }

  /** Load from a YAML file path (missing file → pure defaults + env). */
  def loadFile(path: String, env: Map[String, String] = sys.env): AiConfig = {
    val yaml =
      try Some(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
      catch { case _: Exception => None }
    load(yaml, env)
  }

  /** The engine weights for this config (EnsembleConfig carries the YAML
    * defaults; the runtime dataclass default is Weights.runtimeDefault). */
  def weights(c: AiConfig): graft.ensemble.Weights =
    graft.ensemble.Weights(c.ensemble.wRule, c.ensemble.wNer, c.ensemble.wEmbed)

  /** Load: defaults <- yaml <- env. */
  def load(yaml: Option[String], env: Map[String, String] = sys.env): AiConfig = {
    val fromYaml = yaml.map(parseYaml).getOrElse(Map.empty)
    validateKeys(fromYaml)
    val merged = deepMerge(fromYaml, envOverrides(env))
    val ai = merged.getOrElse("ai", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
    def sub(k: String) = ai.getOrElse(k, Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
    def get[A](m: Map[String, Any], k: String, dflt: A): A = m.get(k).map(_.asInstanceOf[A]).getOrElse(dflt)
    val ner = sub("ner"); val ens = sub("ensemble"); val llm = sub("llm")
    val weights = ens.get("weights").map(_.asInstanceOf[Map[String, Any]]).getOrElse(Map.empty)
    AiConfig(
      mode = get(ai, "mode", "balanced"),
      ner = NerConfig(
        enabled = get(ner, "enabled", true),
        provider = get(ner, "provider", "presidio"),
        confidenceMin = get[Any](ner, "confidence_min", 0.60).toString.toDouble,
        language = get(ner, "language", "en"),
        spacyModel = ner.get("spacy_model").collect { case s: String if s.nonEmpty => s }),
      ensemble = EnsembleConfig(
        wRule = get[Any](weights, "rules", 0.4).toString.toDouble,
        wNer = get[Any](weights, "ner", 0.3).toString.toDouble,
        wEmbed = get[Any](weights, "embeddings", 0.3).toString.toDouble,
        decisionThreshold = get[Any](ens, "decision_threshold", 0.55).toString.toDouble),
      llm = LlmConfig(
        enabled = get(llm, "enabled", false),
        provider = get(llm, "provider", "none"),
        costCapUsdPerScan = get[Any](llm, "cost_cap_usd_per_scan", 0.50).toString.toDouble,
        cacheTtlMinutes = get[Any](llm, "cache_ttl_minutes", 1440).toString.toInt))
  }
}
