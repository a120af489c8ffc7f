package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Edit-distance fuzzy matching — the CHARACTER-level dedup/canonical-
  * ization modality (SURVEY.md §2 north star). The dedup family covers
  * tokens (q42), shingles (q46/q58), and embeddings (q48/q113); OCR
  * noise, typos, and transliteration drift live BELOW the token level,
  * and the production primitive is the fuzzy dictionary join: map every
  * observed token to the canonical lexicon entries within edit
  * distance ≤ 2 (spell-correction, OCR canonicalization, entity-alias
  * resolution).
  *
  * Algorithm: SymSpell (Garbe's symmetric-delete spelling correction) —
  * the scalable shape. A naive fuzzy join is |queries|×|lexicon|
  * levenshtein calls (a cross join — unshippable); SymSpell generates
  * each string's DELETION NEIGHBORHOOD (all variants from deleting ≤ 2
  * chars, a 1+L+L(L−1)/2 bound per string) on BOTH sides and
  * equi-joins on the variant: if lev(a,b) ≤ 2 the two neighborhoods
  * intersect (align the edit script; drop the edited positions from
  * each side), so the equi-join is a complete candidate generator and
  * a final levenshtein ≤ 2 filter removes the false candidates. The
  * oracle deliberately takes the BRUTE-FORCE road (cross join + lev) —
  * a hash match proves the deletion blocking loses nothing.
  *
  * Scale shape (100 TB): per-token variant generation is bounded
  * expression work (O(L²) strings of length ≤ L); the candidate join is
  * EQUI-keyed on the variant (one shuffle, no cross join — the
  * PlanSpec pin); the lexicon side is dictionary-sized and broadcasts.
  * Verification is a codegen'd levenshtein per surviving candidate.
  *
  * Fixture: the lexicon is the corpus vocabulary; the query stream is
  * the vocabulary plus three md5-gated deterministic TYPO arms
  * (deletion, substitution, insertion — one character each) derived
  * from document first-words, so distance-1 matches provably exist and
  * each arm's shape is pinned in OperatorSpec.
  */
object Fuzzy extends QueryGroup {

  /** Max edit distance (and deletion-neighborhood depth). */
  private[graft] val MaxEdits = 2

  /** Lexicon cap — the dictionary side must stay dictionary-sized for
    * the broadcast plan; a corpus-sized lexicon needs the shuffle form.
    */
  private[graft] val MaxLexicon = 4096

  /** All strings reachable by deleting ≤ 2 characters (incl. the
    * string itself) — pure builtin expressions, fully codegen.
    */
  private[graft] def delNeighborhood(s: Column): Column = {
    val L = length(s)
    def del(t: Column, i: Column): Column =
      concat(substr(t, lit(1), i - 1), substr(t, i + 1, length(t)))
    val ones = transform(sequence(lit(1), L), i => del(s, i))
    val twos = flatten(transform(sequence(lit(1), L), i =>
      when(i < L,
        transform(sequence(i + lit(1), L), j => del(del(s, j), i)))
        .otherwise(array().cast("array<string>"))))
    array_distinct(concat(array(s), ones, twos))
  }

  /** Distinct corpus tokens — the canonical lexicon. */
  private[graft] def lexicon(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "").distinct()

  /** The query token stream: the vocabulary plus three deterministic
    * one-character typo arms over md5-gated documents' first words.
    */
  private[graft] def queryTokens(docs: DataFrame): DataFrame = {
    val fw = docs.filter(col("text").isNotNull)
      .select(element_at(split(col("text"), " "), 1).as("w"),
        substring(md5(concat(lit("typo:"), col("doc_id").cast("string"))),
          1, 1).as("g"))
      .filter(col("w") =!= "" && length(col("w")) >= 3)
    val deletion = fw.filter(col("g") < "4")
      .select(concat(substr(col("w"), lit(1), lit(1)),
        substr(col("w"), lit(3), length(col("w")))).as("token"))
    val substitution = fw.filter(col("g") >= "4" && col("g") < "8")
      .select(concat(lit("z"), substr(col("w"), lit(2), length(col("w"))))
        .as("token"))
    val insertion = fw.filter(col("g") >= "8" && col("g") < "c")
      .select(concat(col("w"), lit("q")).as("token"))
    lexicon(docs).select(col("word").as("token"))
      .unionByName(deletion).unionByName(substitution).unionByName(insertion)
      .distinct()
  }

  private[graft] def symspellJoin(
      queries: DataFrame, lex: DataFrame): DataFrame = {
    val lexSide = lex
      // dictionary-sized contract, stated loudly (the q48/q58 stance)
      .withColumn("lexn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(when(col("lexn") > MaxLexicon,
        raise_error(lit(s"q205: lexicon above $MaxLexicon entries — " +
          "broadcast contract void; use the shuffle form")))
        .otherwise(lit(true)))
      .select(col("word"), explode(delNeighborhood(col("word"))).as("v"))
    val qSide = queries
      .select(col("token"), explode(delNeighborhood(col("token"))).as("v"))
    qSide.join(broadcast(lexSide), "v")
      .select(col("token"), col("word")).distinct()
      .select(col("token"), col("word"),
        levenshtein(col("token"), col("word")).cast("long").as("dist"))
      .filter(col("dist") <= MaxEdits)
      .orderBy("token", "word")
  }

  def queries: Map[String, Q] = Map(
    // q205 [north star, r12]: SymSpell fuzzy dictionary join — every
    // observed token mapped to canonical lexicon entries within edit
    // distance 2, deletion-neighborhood equi-join, no cross join.
    "q205_symspell_fuzzy" -> ((spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      symspellJoin(queryTokens(docs), lexicon(docs))
    }))

  def oracles: Map[String, String] = Map(
    // the INDEPENDENT road: brute-force cross join + levenshtein — a
    // hash match proves the deletion-neighborhood blocking is complete
    "q205_symspell_fuzzy" ->
      s"""WITH lex AS (SELECT DISTINCT w AS word FROM
         |  (SELECT unnest(string_split(text,' ')) AS w FROM documents
         |   WHERE text IS NOT NULL) t WHERE w <> ''),
         |fw AS (SELECT string_split(text,' ')[1] AS w,
         |         substring(md5('typo:'||CAST(doc_id AS VARCHAR)),1,1) AS g
         |       FROM documents WHERE text IS NOT NULL),
         |fw3 AS (SELECT w, g FROM fw WHERE w <> '' AND length(w) >= 3),
         |qt AS (
         |  SELECT word AS token FROM lex
         |  UNION
         |  SELECT substring(w,1,1)||substring(w,3) FROM fw3 WHERE g < '4'
         |  UNION
         |  SELECT 'z'||substring(w,2) FROM fw3 WHERE g >= '4' AND g < '8'
         |  UNION
         |  SELECT w||'q' FROM fw3 WHERE g >= '8' AND g < 'c')
         |SELECT q.token, l.word,
         |  CAST(levenshtein(q.token, l.word) AS BIGINT) AS dist
         |FROM qt q, lex l
         |WHERE levenshtein(q.token, l.word) <= $MaxEdits
         |ORDER BY token, word""".stripMargin)
}
