package graft.ingest

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Bronze landing: validate + byte-copy raw exports into the landing zone,
  * idempotently. Re-expression of `pipeline/bronze/ingest.py:206-303` —
  * pure JVM file handling, no Spark needed (the reference uses boto3; at
  * scale this would be the Hadoop FS API against object storage).
  */
object BronzeIngest {

  final case class IngestResult(
      path: String, rows: Long, skipped: Boolean)

  /** Minimal validation: header must carry `_id` and `course`
    * (bronze/ingest.py:67). Returns the data row count. */
  def validateCsv(file: Path): Long = {
    val lines = Files.readAllLines(file)
    require(!lines.isEmpty, s"empty file: $file")
    val header = lines.get(0).split(",").map(_.trim).toSet
    require(header.contains("_id") && header.contains("course"),
      s"missing required columns (_id, course) in $file")
    (lines.size - 1).toLong
  }

  /** Idempotent byte-copy into the landing dir: if the target already
    * exists the upload is skipped (bronze/ingest.py:206-303). */
  def upload(src: Path, landingDir: Path): IngestResult = {
    val rows = validateCsv(src)
    Files.createDirectories(landingDir)
    val target = landingDir.resolve(src.getFileName)
    if (Files.exists(target)) IngestResult(target.toString, rows, skipped = true)
    else {
      Files.copy(src, target, StandardCopyOption.COPY_ATTRIBUTES)
      IngestResult(target.toString, rows, skipped = false)
    }
  }

  /** S8 — course-slug normalization (bronze/ingest.py:157-203): lowercase,
    * strip golf stopwords and non-alphanumerics. A plain Scala string
    * function in the reference; mirrored as such. */
  private val SlugStopwords = Seq("golf", "course", "club", "country", "the", "at", "gc")
  def courseSlug(name: String): String = {
    val lowered = name.toLowerCase
    val stripped = SlugStopwords.foldLeft(lowered)((acc, w) =>
      acc.replaceAll(s"\\b$w\\b", ""))
    stripped.replaceAll("[^a-z0-9]", "")
  }

  /** Containment heuristic: one slug contains the other (ingest.py:190-203). */
  def slugsMatch(a: String, b: String): Boolean = {
    val (sa, sb) = (courseSlug(a), courseSlug(b))
    sa.nonEmpty && sb.nonEmpty && (sa.contains(sb) || sb.contains(sa))
  }
}
