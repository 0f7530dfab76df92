package graft.run

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** S7: full configuration precedence chain — defaults < config file < env <
  * flags — mirroring the reference's defaults < YAML < env < flags
  * (/root/reference/kg-builder/internal/config/config.go:49-207), without a
  * YAML dependency (none ships in this sandbox): the file is the flat
  * `key: value` / `key=value` subset, which covers the reference's config
  * surface.
  *
  * - file: `--conf=<path>`; `#` comments and blank lines ignored.
  * - env:  `GRAFT_<UPPER_SNAKE>` → camelCase key (GRAFT_N_DOCS → nDocs).
  * - flags: `--key=value` (bare `--key` = "true").
  */
object Config {

  def parseFlags(args: Array[String]): Map[String, String] =
    args.filter(_.startsWith("--")).map { a =>
      val kv = a.stripPrefix("--").split("=", 2)
      kv(0) -> (if (kv.length > 1) kv(1) else "true")
    }.toMap

  def camelOf(upperSnake: String): String = {
    val parts = upperSnake.toLowerCase.split('_').filter(_.nonEmpty)
    if (parts.isEmpty) ""
    else parts.head + parts.tail.map(_.capitalize).mkString
  }

  def envOverrides(env: Map[String, String]): Map[String, String] =
    env.collect { case (k, v) if k.startsWith("GRAFT_") && k != "GRAFT_CONF" =>
      camelOf(k.stripPrefix("GRAFT_")) -> v
    }

  def loadFile(path: String): Map[String, String] = {
    if (!Files.exists(Paths.get(path)))
      throw new IllegalArgumentException(s"config file not found: $path")
    Files.readAllLines(Paths.get(path)).asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexWhere(c => c == ':' || c == '=')
        require(i > 0, s"config line is not key: value — '$l'")
        l.substring(0, i).trim -> l.substring(i + 1).trim
      }.toMap
  }

  /** Layered resolution. The conf-file path itself can come from the flag
    * `--conf` or env `GRAFT_CONF` (flag wins, like everything else). */
  def resolve(args: Array[String], env: Map[String, String] = sys.env): Map[String, String] = {
    val flags = parseFlags(args)
    val confPath = flags.get("conf").orElse(env.get("GRAFT_CONF"))
    val file = confPath.map(loadFile).getOrElse(Map.empty)
    (file ++ envOverrides(env) ++ flags) - "conf"
  }
}
