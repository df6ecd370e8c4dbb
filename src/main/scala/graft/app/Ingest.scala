package graft.app

import java.io.{File, FileOutputStream}
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

/** Driver-side ingestion utilities — the Spark-job boundary of the
  * reference's scrape→extract flow (SURVEY.md §2.1 S1/S2).
  *
  *  - S1 (HTTP/Selenium quarterly ZIP fetch, reference:
  *    Airflow/dags/Sec_data_pipeline.py:102-175) is an out-of-engine network
  *    step; in this zero-egress build it is a seam: callers hand
  *    [[extractTxt]] an already-downloaded ZIP. The quarter resolution logic
  *    it needs lives in [[yearQuarter]].
  *  - S2 (ZIP extract of the four `*.txt` members, reference:
  *    Sec_data_pipeline.py:177-201) is plain `java.util.zip` on the driver;
  *    Spark then reads the extracted directory via
  *    [[graft.io.TsvReader.readAll]].
  */
object Ingest {

  /** `date → "{year}q{quarter}"` with the reference API's validation
    * (reference: Backend/api.py:11-26 — regex date shape + year range).
    */
  def yearQuarter(date: String, minYear: Int = 2009, maxYear: Int = 2024): String = {
    require(date.matches("^\\d{4}-\\d{2}-\\d{2}$"), s"bad date format: $date")
    val year = date.take(4).toInt
    val month = date.slice(5, 7).toInt
    require(year >= minYear && year <= maxYear, s"year out of range: $year")
    require(month >= 1 && month <= 12, s"bad month: $month")
    s"$year" + "q" + ((month - 1) / 3 + 1)
  }

  /** Extract the `.txt` members of an EDGAR quarterly ZIP into `destDir`;
    * returns the extracted file names (reference: Sec_data_pipeline.py:177-201).
    */
  def extractTxt(zipPath: String, destDir: String): Seq[String] = {
    val dest = new File(destDir)
    dest.mkdirs()
    val zip = new ZipFile(zipPath)
    try {
      zip.entries().asScala
        .filter(e => !e.isDirectory && e.getName.endsWith(".txt"))
        .map { e =>
          val name = new File(e.getName).getName // flatten, no zip-slip
          val out = new File(dest, name)
          val in = zip.getInputStream(e)
          val os = new FileOutputStream(out)
          try in.transferTo(os) finally { in.close(); os.close() }
          name
        }.toSeq
    } finally zip.close()
  }
}
