package graft.catalog

import java.nio.file.{FileAlreadyExistsException, Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Snapshot tags (Iceberg refs, the `create_tag` surface): named,
  * human-stable pointers into a versioned table's history. A tag makes
  * a snapshot addressable (`VERSION AS OF 'stable'`) and PINS it:
  * `expire_snapshots` never drops a tagged version, so a tag is the
  * retention contract for audits/reproductions (the Iceberg
  * semantics). Names must not parse as numbers — the numeric namespace
  * belongs to raw snapshot ids.
  *
  * MULTI-WRITER safety (r12, the same discipline as [[Snapshots]]):
  * each tag is its OWN file under `_graft_tags/` — `<name>.json`
  * holding the pinned version — published with atomic
  * create-if-absent (hard link), so two writers racing to create tags
  * can never lose each other's (the pre-r12 single-JSON
  * read-modify-write could), and a same-name race has exactly one
  * winner. Dropping a tag deletes its file — atomic again. The legacy
  * single-file `_graft_tags.json` stays readable (and droppable) as a
  * migration artifact; per-tag entries win on a name clash. */
private[catalog] object Tags {

  /** Legacy single-file format (pre-r12) — read + drop supported. */
  val Sidecar = "_graft_tags.json"

  /** One file per tag: `_graft_tags/<urlencoded-name>.json`. */
  val DirName = "_graft_tags"

  private def enc(name: String): String =
    java.net.URLEncoder.encode(name, "UTF-8")
  private def dec(fileName: String): String =
    java.net.URLDecoder.decode(fileName.stripSuffix(".json"), "UTF-8")

  def read(tableDir: Path): Map[String, Long] =
    legacy(tableDir) ++ perTag(tableDir)

  private def legacy(tableDir: Path): Map[String, Long] = {
    val f = tableDir.resolve(Sidecar)
    if (!Files.exists(f)) Map.empty
    else {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(Files.readString(f))
      Option(node.get("tags")).fold(Map.empty[String, Long]) { t =>
        t.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
      }
    }
  }

  private def perTag(tableDir: Path): Map[String, Long] = {
    val d = tableDir.resolve(DirName)
    if (!Files.isDirectory(d)) Map.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json"))
        .flatMap { p =>
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          Option(om.readTree(Files.readString(p)).get("version"))
            .map(v => dec(p.getFileName.toString) -> v.asLong())
        }.toMap
      finally s.close()
    }
  }

  /** Atomically create tag `name` → `v`; false when the tag already
    * exists (either layout) — the caller reports the existing pin. */
  def create(tableDir: Path, name: String, v: Long): Boolean = {
    if (legacy(tableDir).contains(name)) return false
    val d = tableDir.resolve(DirName)
    Files.createDirectories(d)
    val target = d.resolve(enc(name) + ".json")
    val tmp = d.resolve(enc(name) + "." +
      java.util.UUID.randomUUID().toString.take(8) + ".tmp")
    Files.writeString(tmp, s"""{"version": $v}""")
    try { Files.createLink(target, tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally { Files.deleteIfExists(tmp); () }
  }

  /** Drop tag `name`; returns the version it pinned, None if absent.
    * Per-tag files delete atomically; a legacy-file entry rewrites the
    * legacy sidecar without it (migration artifact — new tags never
    * land there). */
  def drop(tableDir: Path, name: String): Option[Long] = {
    val f = tableDir.resolve(DirName).resolve(enc(name) + ".json")
    // exists→read is a TOCTOU window under concurrent drops of the
    // same tag: a loser's read lands on the winner's deletion — treat
    // NoSuchFile as absent, and let deleteIfExists's boolean decide
    // which racer reports the dropped version (exactly one does)
    // Some(vOpt) = a per-tag file was read (version None when the
    // JSON is corrupt/truncated — still DELETE it, or the tag becomes
    // un-droppable); None = no per-tag file
    val perTag: Option[Option[Long]] =
      try {
        if (!Files.exists(f)) None
        else {
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          Some(Option(om.readTree(Files.readString(f)).get("version"))
            .map(_.asLong()))
        }
      } catch { case _: java.nio.file.NoSuchFileException => None }
    perTag match {
      case Some(vOpt) =>
        if (Files.deleteIfExists(f)) vOpt
        else None // concurrent drop won between read and delete
      case None =>
        val cur = legacy(tableDir)
        cur.get(name).map { v => writeLegacy(tableDir, cur - name); v }
    }
  }

  private def writeLegacy(tableDir: Path, tags: Map[String, Long]): Unit = {
    val f = tableDir.resolve(Sidecar)
    if (tags.isEmpty) { Files.deleteIfExists(f); () }
    else {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.createObjectNode()
      val t = root.putObject("tags")
      tags.toSeq.sortBy(_._1).foreach { case (n, v) => t.put(n, v) }
      val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
      Files.writeString(tmp, om.writeValueAsString(root))
      Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }
}
