package graft.functions

import java.time.LocalDate
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField
import java.util.Locale

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

import graft.html.MiniHtml
import graft.html.MiniHtml.{Elem, TextNode}
import graft.schema.Schemas.ParsedJobFields

/** The engine's HTML-extraction function family.
  *
  * Reimplements the semantics of the reference's single UDF
  * `parse_job_html` (/root/reference/spark/lib/utils.py:10-125) on the
  * in-JVM MiniHtml DOM:
  *
  *  - job title / company from `div[data-automation=detailsTitle]` h1/span;
  *  - description from `div[data-automation=jobDescription] > div`
  *    with "\n" separators;
  *  - header fields (location / post date / salary band) classified by the
  *    reference's conditional cascade over `div.sx2jih0.zcydq86a` children;
  *  - label→next-sibling lookups for Career Level / Qualification /
  *    Job Type / Job Functions / Industry;
  *  - job_functions commas become semicolons (utils.py:97, observable in
  *    golden outputs).
  *
  * Design differences from the reference (deliberate, SURVEY §4.4):
  *  - returns a typed 12-field struct evaluated ONCE per row, not an
  *    array-returning UDF referenced 12 times (the U2 hazard);
  *  - total function: a page missing a section yields "" fields instead of
  *    a task-killing exception;
  *  - the `[-2:] == "22"` year hardcode (utils.py:57) is generalized to a
  *    `dd-MMM-yy` pattern match;
  *  - salary fields stay strings here ("" for missing); the typed
  *    projection casts them (empty → null) downstream.
  */
object JobParse {

  // "3-Oct-22" — single- or double-digit day, English month abbreviation,
  // two-digit year pivoting at 2000 (Python's %y).
  private val postedOn = new DateTimeFormatterBuilder()
    .parseCaseInsensitive()
    .appendPattern("d-MMM-")
    .appendValueReduced(ChronoField.YEAR, 2, 2, 2000)
    .toFormatter(Locale.US)

  private val outDate = DateTimeFormatter.ofPattern("yyyy-MM-dd", Locale.US)

  private val postedOnRe = """.*\b\d{1,2}-[A-Za-z]{3}-\d{2}$""".r

  def parseJob(html: String, scrapedDate: String): ParsedJobFields = {
    val doc = MiniHtml.parse(if (html == null) "" else html)

    val details = doc.find("div", "data-automation" -> "detailsTitle")
    val jobTitle = details.flatMap(_.firstTag("h1")).map(_.text().trim).getOrElse("")
    val companyName = details.flatMap(_.firstTag("span")).map(_.text().trim).getOrElse("")

    val jobDescription = doc.find("div", "data-automation" -> "jobDescription")
      .flatMap(_.firstTag("div"))
      .map(_.text("\n"))
      .getOrElse("")

    var location = ""
    var officialPostDate = ""
    var minOfficialSalary = ""
    var maxOfficialSalary = ""

    val headerChildren: Seq[Elem] = doc.find("div", "data-automation" -> "jobDetailsHeader")
      .map(_.findAll("div", "class" -> "sx2jih0 zcydq86a"))
      .getOrElse(Seq.empty)

    headerChildren.foreach { child =>
      val t = child.text()
      if (t.takeRight(4) == " ago") {
        // "Posted N days ago" — resolve against the scrape date (F13)
        officialPostDate = scrapedDate
      } else if (postedOnRe.matches(t)) {
        val raw = t.split(" on ", 2).last
        try officialPostDate = LocalDate.parse(raw.trim, postedOn).format(outDate)
        catch { case _: Exception => () }
      } else if (t.takeRight(7).trim == "/month") {
        try {
          if (t.take(5) == "Above") {
            minOfficialSalary =
              t.split("\\$")(1).dropRight(7).replace(",", "").trim.toInt.toString
          } else {
            minOfficialSalary =
              t.split(" - ")(0).drop(3).replace(",", "").trim.toInt.toString
            maxOfficialSalary =
              t.dropRight(7).split(" - ")(1).drop(3).replace(",", "").trim.toInt.toString
          }
        } catch { case _: Exception => () }
      } else if (t.trim.nonEmpty) {
        location = t
      }
    }

    // label → value-in-next-sibling section lookups
    def siblingText(scope: Elem, label: String): String =
      scope.findByString("div", label)
        .flatMap(_.nextSibling)
        .map {
          case e: Elem => e.text()
          case TextNode(v) => v
        }
        .getOrElse("")

    val additionalInfo = doc.findByString("div", "Additional Information").map(_.parent)
    val careerLevel = additionalInfo.map(siblingText(_, "Career Level")).getOrElse("")
    val qualification = additionalInfo.map(siblingText(_, "Qualification")).getOrElse("")
    val jobType = additionalInfo.map(siblingText(_, "Job Type")).getOrElse("")
    val jobFunctions = additionalInfo.map(siblingText(_, "Job Functions")).getOrElse("")
      .trim.replace(",", ";")

    val industry = doc.findByString("div", "Additional Company Information")
      .map(_.parent)
      .map(siblingText(_, "Industry"))
      .getOrElse("")

    ParsedJobFields(
      job_title = jobTitle,
      company_name = companyName,
      job_description = jobDescription,
      location = location,
      official_post_date = officialPostDate,
      min_official_salary = minOfficialSalary,
      max_official_salary = maxOfficialSalary,
      career_level = careerLevel,
      qualification = qualification,
      job_type = jobType,
      job_functions = jobFunctions,
      industry = industry)
  }

  /** Struct-returning UDF: one evaluation per row, expand with select("p.*"). */
  val parseJobUdf = udf((html: String, scrapedDate: String) => parseJob(html, scrapedDate))

  /** Generic selector UDF: text of the first element matching tag+attribute. */
  val selectTextUdf = udf((html: String, tag: String, attr: String, value: String) =>
    MiniHtml.parse(if (html == null) "" else html)
      .find(tag, attr -> value).map(_.text().trim).getOrElse(""))

  /** Label→next-sibling lookup UDF (the reference's F2 pattern). */
  val siblingTextUdf = udf((html: String, label: String) =>
    MiniHtml.parse(if (html == null) "" else html)
      .findByString("div", label)
      .flatMap(_.nextSibling)
      .map { case e: Elem => e.text(); case TextNode(v) => v }
      .getOrElse(""))

  /** Register the family for the SQL surface. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("parse_job", parseJobUdf)
    spark.udf.register("html_select_text", selectTextUdf)
    spark.udf.register("html_sibling_text", siblingTextUdf)
  }

  def parse_job(html: Column, scrapedDate: Column): Column = parseJobUdf(html, scrapedDate)
}
