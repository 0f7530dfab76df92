package graft

import graft.run.{Config, Main}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S7 precedence chain: defaults < file < env < flags — mirrors the
  * reference's config_test.go cases (defaults, file override, env override,
  * flag override). */
class ConfigSpec extends AnyFunSuite {

  private def confFile(lines: String*): String = {
    val f = Files.createTempFile("graft-conf", ".conf")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("defaults when nothing is set") {
    val c = Main.confFrom(Config.resolve(Array.empty, env = Map.empty))
    assert(c.nDocs == 400L && c.nBuckets == 8 && !c.fastExtract)
  }

  test("file overrides defaults; both 'key: value' and 'key=value' parse; comments skipped") {
    val f = confFile("# corpus size", "nDocs: 123", "nBuckets=16", "", "workDir: /tmp/kg-x")
    val m = Config.resolve(Array(s"--conf=$f"), env = Map.empty)
    val c = Main.confFrom(m)
    assert(c.nDocs == 123L && c.nBuckets == 16 && c.workDir == "/tmp/kg-x")
    assert(!m.contains("conf")) // the pointer itself is not config
  }

  test("env overrides file; flags override env") {
    val f = confFile("nDocs: 123", "concurrency: 2")
    val env = Map("GRAFT_N_DOCS" -> "456", "GRAFT_SEED" -> "7")
    val viaEnv = Main.confFrom(Config.resolve(Array(s"--conf=$f"), env))
    assert(viaEnv.nDocs == 456L)      // env beats file
    assert(viaEnv.seed == 7L)         // env beats default
    assert(viaEnv.concurrency == 2)   // file survives where env is silent
    val viaFlag = Main.confFrom(
      Config.resolve(Array(s"--conf=$f", "--nDocs=789"), env))
    assert(viaFlag.nDocs == 789L)     // flag beats env beats file
  }

  test("snapshot-GC knobs ride the same precedence chain (defaults < file < env < flags)") {
    // defaults: bounded disk out of the box
    assert(Main.gcKnobs(Config.resolve(Array.empty, env = Map.empty))
      == ((2, 64, 300000L)))
    val f = confFile("vacuumRetain: 5", "maxChain: 8")
    val env = Map("GRAFT_VACUUM_RETAIN" -> "7", "GRAFT_VACUUM_GRACE_MS" -> "0")
    // file beats default; env beats file; default survives where both silent
    assert(Main.gcKnobs(Config.resolve(Array(s"--conf=$f"), Map.empty))
      == ((5, 8, 300000L)))
    assert(Main.gcKnobs(Config.resolve(Array(s"--conf=$f"), env))
      == ((7, 8, 0L)))
    // flag beats env
    assert(Main.gcKnobs(Config.resolve(
      Array(s"--conf=$f", "--vacuumRetain=3", "--maxChain=16"), env))
      == ((3, 16, 0L)))
  }

  test("conf path itself can come from env; flag wins") {
    val f1 = confFile("nDocs: 111")
    val f2 = confFile("nDocs: 222")
    val env = Map("GRAFT_CONF" -> f1)
    assert(Main.confFrom(Config.resolve(Array.empty, env)).nDocs == 111L)
    assert(Main.confFrom(Config.resolve(Array(s"--conf=$f2"), env)).nDocs == 222L)
  }

  test("GRAFT_UPPER_SNAKE maps to camelCase keys") {
    assert(Config.camelOf("N_DOCS") == "nDocs")
    assert(Config.camelOf("FAST_EXTRACT") == "fastExtract")
    assert(Config.camelOf("WORKDIR") == "workdir")
    assert(Config.envOverrides(Map("GRAFT_FAST_EXTRACT" -> "true", "HOME" -> "/x"))
      == Map("fastExtract" -> "true"))
  }

  test("missing or malformed config file fails loudly") {
    intercept[IllegalArgumentException] {
      Config.resolve(Array("--conf=/nonexistent/path.conf"), env = Map.empty)
    }
    val bad = confFile("just a line with no separator")
    intercept[IllegalArgumentException] {
      Config.resolve(Array(s"--conf=$bad"), env = Map.empty)
    }
  }
}
