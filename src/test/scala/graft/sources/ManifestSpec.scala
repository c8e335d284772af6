package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class ManifestSpec extends SparkSpec {

  private def writeText(dir: String, name: String, content: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, name), content): Unit
  }

  test("snapshot diff: first run sees all, committed run sees none, new and modified files re-extract") {
    val base = tmpDir("manifest-src")
    val data = s"$base/data"
    val state = s"$base/state"
    writeText(data, "f1.txt", "one\n")
    writeText(data, "f2.txt", "two\n")

    // run 1: everything is new
    val run1 = ManifestSource.plan(spark, state, "ds", data, format = "text")
    assert(run1.newFiles.map(f => new java.io.File(f.path).getName).toSet ==
      Set("f1.txt", "f2.txt"))
    assert(run1.df.count() == 2)
    run1.commit()

    // run 2: nothing changed -> empty delta, schema preserved
    val run2 = ManifestSource.plan(spark, state, "ds", data, format = "text")
    assert(run2.newFiles.isEmpty)
    assert(run2.df.count() == 0)
    assert(run2.df.columns.toSeq == Seq("value"))

    // run 3: one appended file + one rewritten (length change) file
    writeText(data, "f3.txt", "three\n")
    writeText(data, "f1.txt", "one longer now\n")
    val run3 = ManifestSource.plan(spark, state, "ds", data, format = "text")
    assert(run3.newFiles.map(f => new java.io.File(f.path).getName).toSet ==
      Set("f1.txt", "f3.txt"))
    // the scan itself touches ONLY the delta files (plan-time pruning)
    assert(run3.df.inputFiles.map(f => new java.io.File(f).getName).toSet ==
      Set("f1.txt", "f3.txt"))
    run3.commit()

    // run 4: stable again
    assert(ManifestSource.plan(spark, state, "ds", data, format = "text")
      .newFiles.isEmpty)
  }

  test("same-length in-place rewrite re-extracts (modTime freshness)") {
    val base = tmpDir("manifest-modtime")
    val data = s"$base/data"
    val state = s"$base/state"
    writeText(data, "f1.txt", "aaaa\n")
    val run1 = ManifestSource.plan(spark, state, "ds", data, format = "text")
    assert(run1.newFiles.size == 1)
    run1.commit()

    // rewrite with identical byte length but a bumped modTime
    writeText(data, "f1.txt", "bbbb\n")
    Files.setLastModifiedTime(Paths.get(data, "f1.txt"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    val run2 = ManifestSource.plan(spark, state, "ds", data, format = "text")
    assert(run2.newFiles.map(f => new java.io.File(f.path).getName) == Seq("f1.txt"))
    run2.commit()
    assert(ManifestSource.plan(spark, state, "ds", data, format = "text")
      .newFiles.isEmpty)
  }

  test("manifests without mod_time match on length alone (upgrade compat)") {
    val base = tmpDir("manifest-compat")
    val data = s"$base/data"
    val state = s"$base/state"
    writeText(data, "f1.txt", "one\n")
    val files = ManifestSource.listFiles(spark, data)
    // hand-written pre-upgrade manifest: no mod_time field
    Files.createDirectories(Paths.get(state))
    Files.writeString(Paths.get(state, "manifest-ds.json"),
      files.map(f => s"""{"path":"${f.path}","length":${f.length}}""")
        .mkString("\n"))
    val run = ManifestSource.plan(spark, state, "ds", data, format = "text")
    assert(run.newFiles.isEmpty, "length-only match must keep the delta empty")
  }

  test("hidden/marker files are ignored; missing root is an empty listing") {
    val base = tmpDir("manifest-hidden")
    val data = s"$base/data"
    writeText(data, "visible.txt", "x\n")
    writeText(data, "_SUCCESS", "")
    writeText(data, ".staging-tmp", "y")
    val files = ManifestSource.listFiles(spark, data)
    assert(files.map(f => new java.io.File(f.path).getName) == Seq("visible.txt"))
    assert(ManifestSource.listFiles(spark, s"$base/nope").isEmpty)
  }
}
