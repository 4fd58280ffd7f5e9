package graft.yelp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's derived-column semantics, re-expressed as native
  * Catalyst expressions (whole-stage-codegen friendly; the reference
  * pays a Python-UDF serialization boundary for super_category,
  * reference glue_job.py:50-73 — we do not).
  */
object Transforms {

  /** Super-category keyword table. Order is load-bearing: the
    * reference's Python dict iterates in insertion order and returns
    * the FIRST category whose keyword is a substring of `categories`
    * (reference glue_job.py:50-70; same table at scripts/etl.py:63-88).
    * "Food Trucks; Bars" must map to Restaurants, not Nightlife.
    */
  val superCategories: Seq[(String, Seq[String])] = Seq(
    "Restaurants" -> Seq("Restaurants", "Food"),
    "Shopping" -> Seq("Shopping", "Fashion", "Books", "Department Stores"),
    "Beauty & Spas" -> Seq("Hair Salons", "Beauty & Spas", "Nail Salons",
      "Massage"),
    "Health & Medical" -> Seq("Dentists", "Health & Medical",
      "Chiropractors"),
    "Nightlife" -> Seq("Bars", "Nightlife", "Clubs", "Pubs"),
    "Automotive" -> Seq("Auto Repair", "Automotive", "Car Dealers"),
    "Fitness" -> Seq("Gyms", "Fitness & Instruction", "Yoga", "Trainers"),
    "Home Services" -> Seq("Home Services", "Plumbing", "Electricians"),
    "Education" -> Seq("Education", "Tutoring Centers"),
    "Pets" -> Seq("Pet Services", "Veterinarians", "Pet Stores"))

  /** Flattened (keyword, category) pairs in first-match order. */
  val keywordOrder: Seq[(String, String)] =
    superCategories.flatMap { case (cat, kws) => kws.map(_ -> cat) }

  /** First-match containment chain as a single `when` expression —
    * pure Catalyst `Contains`/`CaseWhen`, no UDF. Null → "Other",
    * no match → "Other" (reference glue_job.py:64-65,71). */
  def superCategory(categories: Column): Column = {
    val chain = keywordOrder.foldLeft(Option.empty[Column]) {
      case (acc, (kw, cat)) => Some(acc match {
        case None    => when(categories.contains(kw), cat)
        case Some(w) => w.when(categories.contains(kw), cat)
      })
    }.get
    when(categories.isNull, "Other").otherwise(coalesce(chain, lit("Other")))
  }

  /** Star-rating sentiment (reference scripts/etl.py:96-101):
    * stars <= 2 → negative, == 3 → neutral, else positive. */
  def sentiment(stars: Column): Column =
    when(stars <= 2, "negative")
      .when(stars === 3, "neutral")
      .otherwise("positive")

  /** State-abbreviation normalization
    * (reference scripts/glue_job.py:85-115). The reference is a
    * 27-branch when-chain; the scalable form is a broadcast map
    * literal + coalesce — constant-folded, O(1) per row, and the
    * unknown-code pass-through falls out of `coalesce`. The quirky
    * "Unknown" → Mississippi branch is preserved verbatim
    * (scripts/glue_job.py:113; SURVEY.md §3.5). */
  val stateNames: Map[String, String] = Map(
    "DE" -> "Delaware", "MO" -> "Missouri", "VI" -> "Virgin Islands",
    "IL" -> "Illinois", "SD" -> "South Dakota", "UT" -> "Utah",
    "HI" -> "Hawaii", "CA" -> "California", "NC" -> "North Carolina",
    "AZ" -> "Arizona", "LA" -> "Louisiana", "NJ" -> "New Jersey",
    "MT" -> "Montana", "FL" -> "Florida", "MI" -> "Michigan",
    "NV" -> "Nevada", "ID" -> "Idaho", "VT" -> "Vermont",
    "WA" -> "Washington", "IN" -> "Indiana", "TN" -> "Tennessee",
    "TX" -> "Texas", "CO" -> "Colorado", "PA" -> "Pennsylvania",
    "AB" -> "Alberta", "MA" -> "Massachusetts",
    "Unknown" -> "Mississippi")

  def normalizeState(state: Column): Column =
    coalesce(element_at(typedLit(stateNames), state), state)
}
