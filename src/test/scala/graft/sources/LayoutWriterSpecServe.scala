package graft.sources

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** serveOrWriteBucketed — the cross-session at-rest serve: data files left
  * in the warehouse by a previous session (catalog entries die with the
  * JVM, files don't) must register as an external bucketed table WITHOUT
  * forcing the upstream build, keep bucket metadata (exchange-free join),
  * and read back losslessly; without the flag the same call must rebuild —
  * including over an orphaned location, which previously threw
  * LOCATION_ALREADY_EXISTS (measured on the second JVM in a cwd). */
class LayoutWriterSpecServe extends SharedSparkSpec {
  import spark.implicits._

  private def freshRows = (1L to 200L).map(i => (i, (i % 13).toInt, s"v$i"))
    .toDF("id", "bucket", "payload")

  test("orphaned location: rebuild overwrites instead of LOCATION_ALREADY_EXISTS") {
    val tbl = "graft_serve_orphan_test"
    LayoutWriter.writeBucketed(freshRows, tbl, Seq("bucket"), 4, "overwrite")
    // Simulate the next JVM: drop only the CATALOG entry, keep the files.
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
      .filter(col("col_name") === "Location").head().getString(1)
    val dir = new java.io.File(new java.net.URI(loc))
    spark.sessionState.catalog.dropTable(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl),
      ignoreIfNotExists = false, purge = false)
    // in-memory catalog drop removes files for managed tables; restore them
    if (!dir.exists()) {
      LayoutWriter.writeBucketed(freshRows, tbl, Seq("bucket"), 4, "overwrite")
      spark.sessionState.catalog.dropTable(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl),
        ignoreIfNotExists = false, purge = false)
    }
    if (!dir.exists()) dir.mkdirs() // worst case: orphan dir, no files
    // The rebuild path must clean the orphan and succeed.
    LayoutWriter.writeBucketed(freshRows, tbl, Seq("bucket"), 4, "overwrite")
    assert(spark.table(tbl).count() == 200L)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("serve path registers existing files, never forces the build") {
    val src = "graft_serve_src_test"
    val dst = "graft_serve_dst_test"
    LayoutWriter.writeBucketed(freshRows, src, Seq("bucket"), 4, "overwrite")
    // Simulate a previous session's at-rest data under dst's default
    // location: copy src's files (catalog knows nothing about dst).
    val srcLoc = new java.io.File(new java.net.URI(
      spark.sql(s"DESCRIBE TABLE EXTENDED $src")
        .filter(col("col_name") === "Location").head().getString(1)))
    val dstLoc = new java.io.File(srcLoc.getParentFile, dst)
    def copyAll(from: java.io.File, to: java.io.File): Unit = {
      to.mkdirs()
      from.listFiles().foreach { f =>
        if (f.isFile) java.nio.file.Files.copy(f.toPath,
          new java.io.File(to, f.getName).toPath)
        else copyAll(f, new java.io.File(to, f.getName))
      }
    }
    copyAll(srcLoc, dstLoc)
    sys.props("spark.graft.serveLayouts") = "1"
    try {
      val served = LayoutWriter.serveOrWriteBucketed(
        spark,
        { fail("serve path forced the upstream build"); freshRows },
        dst, Seq("bucket"), 4)
      assert(served, "expected serve-from-rest, got a rebuild")
      // Lossless read-back through the registered external table.
      val back = spark.table(dst).as[(Long, Int, String)].collect().sortBy(_._1)
      val orig = freshRows.as[(Long, Int, String)].collect().sortBy(_._1)
      assert(back.toSeq == orig.toSeq)
      // Bucket metadata restored: self-join plans with no exchange on bucket.
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(key)
      try {
        spark.conf.set(key, "-1")
        val p = spark.table(dst).as("a").join(spark.table(dst).as("b"), Seq("bucket"))
          .queryExecution.executedPlan.toString
        assert(p.contains("Bucketed: true"), p.take(1200))
        assert(!p.contains("Exchange hashpartitioning(bucket"), p.take(1200))
      } finally spark.conf.set(key, prev)
      // Second call in the same session: already registered, still served.
      assert(LayoutWriter.serveOrWriteBucketed(
        spark, { fail("re-serve forced the build"); freshRows },
        dst, Seq("bucket"), 4))
    } finally {
      sys.props.remove("spark.graft.serveLayouts")
      spark.sql(s"DROP TABLE IF EXISTS $dst")
      spark.sql(s"DROP TABLE IF EXISTS $src")
    }
  }

  test("source fingerprint: stale at-rest data forces a rebuild, fresh serves") {
    // A fixture dir regenerated IN PLACE keeps its path, so deterministic
    // table names alone would serve the OLD artifact. The _graft_src_fp
    // stamp must catch it: mismatch (or missing stamp) → rebuild; match →
    // serve without forcing the build.
    val srcDir = java.nio.file.Files.createTempDirectory("graft_fp_src").toFile
    val tbl = "graft_serve_fp_test"
    def writeSource(tag: String): Unit = {
      val f = new java.io.File(srcDir, "data.txt")
      val w = new java.io.FileWriter(f); w.write(tag); w.close()
      f.setLastModified(System.currentTimeMillis() + (if (tag == "v2") 5000 else 0))
    }
    try {
      writeSource("v1")
      // Build once WITH the fingerprint stamp (flag off = plain write).
      assert(!LayoutWriter.serveOrWriteBucketed(
        spark, freshRows, tbl, Seq("bucket"), 4, Some(srcDir.getAbsolutePath)))
      // Drop only the catalog entry, keep the files + stamp (next-JVM sim).
      val loc = new java.io.File(new java.net.URI(
        spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
          .filter(col("col_name") === "Location").head().getString(1)))
      val keep = java.nio.file.Files.createTempDirectory("graft_fp_keep").toFile
      def copyAll(from: java.io.File, to: java.io.File): Unit = {
        to.mkdirs()
        from.listFiles().foreach { f =>
          if (f.isFile) java.nio.file.Files.copy(f.toPath,
            new java.io.File(to, f.getName).toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          else copyAll(f, new java.io.File(to, f.getName))
        }
      }
      copyAll(loc, keep)
      spark.sessionState.catalog.dropTable(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl),
        ignoreIfNotExists = false, purge = false)
      copyAll(keep, loc)
      // Unchanged source → stamp matches → served WITHOUT the serve flag:
      // a fingerprinted caller reuses in default mode too (a no-op
      // maintenance run over unchanged sources — the stamp is what made
      // rebuild-by-default unnecessary).
      assert(LayoutWriter.serveOrWriteBucketed(
        spark, { fail("fp-matched serve forced the build"); freshRows },
        tbl, Seq("bucket"), 4, Some(srcDir.getAbsolutePath)),
        "expected default-mode serve-from-rest on matching fingerprint")
      spark.sessionState.catalog.dropTable(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl),
        ignoreIfNotExists = false, purge = false)
      copyAll(keep, loc)
      // Regenerate the source in place → stamp mismatch → MUST rebuild
      // (with or without the flag; use the flag to pin the serve path's
      // staleness refusal specifically).
      writeSource("v2")
      sys.props("spark.graft.serveLayouts") = "1"
      var built = false
      assert(!LayoutWriter.serveOrWriteBucketed(
        spark, { built = true; freshRows },
        tbl, Seq("bucket"), 4, Some(srcDir.getAbsolutePath)),
        "stale fingerprint must not serve")
      assert(built, "rebuild path did not run the upstream build")
      // The rebuild re-stamped: a THIRD call now serves again.
      assert(spark.table(tbl).count() == 200L)
    } finally {
      sys.props.remove("spark.graft.serveLayouts")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      srcDir.listFiles().foreach(_.delete()); srcDir.delete()
    }
  }

  test("catalog-resident table: in-session source regeneration still detected") {
    // The tableExists fast path must NOT trust the catalog entry alone
    // when the caller names a source: a fixture dir regenerated in place
    // WITHIN a session (or a persistent metastore across deployments)
    // keeps the entry while the data under it goes stale.
    val srcDir = java.nio.file.Files.createTempDirectory("graft_fp_insess").toFile
    val tbl = "graft_serve_fp_insession_test"
    def writeSource(tag: String, bump: Long): Unit = {
      val f = new java.io.File(srcDir, "data.txt")
      val w = new java.io.FileWriter(f); w.write(tag); w.close()
      f.setLastModified(System.currentTimeMillis() + bump)
    }
    try {
      writeSource("v1", 0)
      assert(!LayoutWriter.serveOrWriteBucketed(
        spark, freshRows, tbl, Seq("bucket"), 4, Some(srcDir.getAbsolutePath)))
      // Same session, same catalog entry, UNCHANGED source → reuse.
      assert(LayoutWriter.serveOrWriteBucketed(
        spark, { fail("fresh in-session reuse forced the build"); freshRows },
        tbl, Seq("bucket"), 4, Some(srcDir.getAbsolutePath)))
      // Regenerate the source in place — the catalog entry survives, the
      // stamp no longer matches → the next call MUST rebuild.
      writeSource("v2", 7000)
      var built = false
      assert(!LayoutWriter.serveOrWriteBucketed(
        spark, { built = true; freshRows },
        tbl, Seq("bucket"), 4, Some(srcDir.getAbsolutePath)),
        "catalog-resident stale table must not serve")
      assert(built, "in-session staleness did not trigger the rebuild")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      srcDir.listFiles().foreach(_.delete()); srcDir.delete()
    }
  }

  test("marker payload: a bucket-spec change invalidates like a source change") {
    // The stamp carries (format version, bucket columns, fp): registering
    // old files under a DIFFERENT bucketing declaration would silently
    // mis-route an exchange-free join, so a bucket-spec mismatch must
    // refuse exactly like a stale fingerprint.
    val srcDir = java.nio.file.Files.createTempDirectory("graft_fp_bcols").toFile
    val tbl = "graft_serve_fp_bcols_test"
    try {
      val f = new java.io.File(srcDir, "data.txt")
      val w = new java.io.FileWriter(f); w.write("v1"); w.close()
      assert(!LayoutWriter.serveOrWriteBucketed(
        spark, freshRows, tbl, Seq("bucket"), 4, Some(srcDir.getAbsolutePath)))
      // Next-JVM sim: drop the catalog entry, keep files + stamp.
      val loc = new java.io.File(new java.net.URI(
        spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
          .filter(col("col_name") === "Location").head().getString(1)))
      val keep = java.nio.file.Files.createTempDirectory("graft_fp_bkeep").toFile
      def copyAll(from: java.io.File, to: java.io.File): Unit = {
        to.mkdirs()
        from.listFiles().foreach { g =>
          if (g.isFile) java.nio.file.Files.copy(g.toPath,
            new java.io.File(to, g.getName).toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          else copyAll(g, new java.io.File(to, g.getName))
        }
      }
      copyAll(loc, keep)
      spark.sessionState.catalog.dropTable(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl),
        ignoreIfNotExists = false, purge = false)
      copyAll(keep, loc)
      // Same files, same source — but a caller declaring DIFFERENT bucket
      // columns must not register them.
      assert(!LayoutWriter.registerIfFresh(
        spark, tbl, Seq("id"), 4, Some(srcDir.getAbsolutePath)),
        "bucket-spec mismatch must refuse to register")
      // The original spec still registers.
      assert(LayoutWriter.registerIfFresh(
        spark, tbl, Seq("bucket"), 4, Some(srcDir.getAbsolutePath)))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      srcDir.listFiles().foreach(_.delete()); srcDir.delete()
    }
  }
}
