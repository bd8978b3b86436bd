package graft.catalog

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Snapshot tags (Iceberg refs, the `create_tag` surface): named,
  * human-stable pointers into a versioned table's history —
  * `_graft_tags.json` maps tag name → snapshot version. A tag makes a
  * snapshot addressable (`VERSION AS OF 'stable'`) and PINS it:
  * `expire_snapshots` never drops a tagged version, so a tag is the
  * retention contract for audits/reproductions (the Iceberg
  * semantics). Names must not parse as numbers — the numeric namespace
  * belongs to raw snapshot ids. */
private[catalog] object Tags {

  val Sidecar = "_graft_tags.json"

  def read(tableDir: Path): Map[String, Long] = {
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

  def write(tableDir: Path, tags: Map[String, Long]): Unit = {
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
