package graft

/** Engine configuration (SURVEY.md §2 A3): the reference validates its env
  * against a typed schema with defaults (`ShareId: string`, `DEBUG` boolean
  * defaulting false; `/root/reference/task.ts:8-16,63-66`) and aborts on a missing
  * required key. Same contract here: typed fields, declared defaults,
  * fail-fast on absent required keys.
  */
final case class Config(
    shareId: String,
    debug: Boolean = false,
    sfDir: String = "/root/testdata/sf0.001",
    cpus: Int = 4,
    /** A9 strict-fidelity arm: replicate the reference's JS coercion of
      * present-but-null style values (`String(null)`="null",
      * `Number(null)`=0, `task.ts:116-120`) instead of the engine's
      * default nullify (the one deliberate reference delta —
      * [[graft.operators.CalTopo]] divergence notes). Off by default:
      * "null"-the-string and 0-opacity are corrupt style data no
      * consumer wants unless migrating bit-for-bit.
      */
    strictJsSemantics: Boolean = false)

object Config {
  /** Parse from an env-style map; missing required key => IllegalArgument
    * (the reference's schema-validation abort), bad boolean/int => same.
    */
  def fromEnv(env: Map[String, String]): Config = {
    val shareId = env.getOrElse("SHARE_ID",
      throw new IllegalArgumentException("SHARE_ID is required"))
    def bool(k: String, dflt: Boolean) = env.get(k) match {
      case None => dflt
      case Some("true") => true
      case Some("false") => false
      case Some(v) =>
        throw new IllegalArgumentException(s"$k must be true/false, got '$v'")
    }
    def int(k: String, dflt: Int) = env.get(k).map { v =>
      try v.toInt catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"$k must be an int, got '$v'")
      }
    }.getOrElse(dflt)
    Config(
      shareId = shareId,
      debug = bool("DEBUG", dflt = false),
      sfDir = env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
      cpus = int("SPARK_GRAFT_CPUS", 4),
      strictJsSemantics = bool("GRAFT_STRICT_JS", dflt = false))
  }
}
