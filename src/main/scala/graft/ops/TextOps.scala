package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for training-data pipelines, over the
  * `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * Everything here — including the 20-language char-n-gram
  * language-ID — is built from `org.apache.spark.sql.functions`
  * (codegen'd, whole-stage): no UDFs, no mapPartitions, so every
  * operator fuses into the surrounding projection and is replicated
  * verbatim by the DuckDB oracles.
  */
object TextOps {

  val Stopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "it", "on", "for", "with",
    "as", "at", "by", "an", "be", "this", "that", "from", "or")

  /** whitespace tokens (documents.text is space-separated). */
  def tokens(text: Column): Column = split(text, " +")

  /** Token counting: whitespace tokens + a BPE-ish subword token count
    * (runs of letters, digits, or single punctuation — the classic
    * GPT-2-style pre-tokenizer shape, counted not materialized). */
  def withTokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_ws_tokens", size(tokens(col(textCol))))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col(textCol), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))))

  /** Quality scoring signals as exact integer counts (ratios are for
    * the caller — integers keep DuckDB-oracle comparisons exact). */
  def withQualitySignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_chars_obs", length(col(textCol)))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_stopwords",
        size(filter(toks, t => t.isInCollection(Stopwords))))
      .withColumn("n_punct",
        length(col(textCol)) - length(regexp_replace(col(textCol), lit("[.,;:!?]"), lit(""))))
      .withColumn("n_upper",
        length(col(textCol)) - length(regexp_replace(col(textCol), lit("[A-Z]"), lit(""))))
  }

  /** Document fingerprint: 64-bit content hash of the normalized text
    * (xxhash64 — Spark-native, seed 42) plus an md5 hex fingerprint
    * (portable to DuckDB for the oracle). */
  def withFingerprints(df: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = lower(regexp_replace(col(textCol), lit("\\s+"), lit(" ")))
    df.withColumn("fp_md5", md5(norm))
      .withColumn("fp_xx64", xxhash64(norm))
  }

  /** Word-marker lists for the q15 per-language SCORE columns (kept
    * as its own operator: raw marker-hit counts as features). */
  val LangMarkers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "with", "is"),
    "de" -> Set("der", "die", "das", "und", "mit"),
    "es" -> Set("el", "la", "los", "con", "que"),
    "fr" -> Set("le", "la", "les", "avec", "est"),
    "zh" -> Set("的", "和", "是", "了", "在")
  )

  /** Character-n-gram profiles for 20 languages (language-ID model).
    * Each entry is a distinctive character n-gram of the language —
    * function words anchored by spaces (the classic Cavnar-Trenkle
    * char-n-gram profile idea, reduced to its deterministic core) or
    * high-frequency CJK characters for zh. The score of a language is
    * the number of CHARACTERS of the padded lowercased text covered
    * by non-overlapping matches of its n-grams, so longer (more
    * specific) n-grams weigh more by construction. The counting
    * primitive — `length(t) - length(replace(t, g, ''))` — is exactly
    * replicable in any SQL engine, which is how the q16 DuckDB oracle
    * verifies the operator end to end. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", " that ", " with ", " for ", "ing ", " you ", " are "),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", " nicht ", " mit ", " ein ", " zu ", "sch"),
    "es" -> Seq(" el ", " los ", " las ", " que ", " es ", " una ", " con ", " para ", " por ", "ción"),
    "fr" -> Seq(" le ", " les ", " des ", " est ", " que ", " avec ", " une ", " pour ", " dans ", " pas "),
    "it" -> Seq(" il ", " che ", " di ", " per ", " con ", " una ", " non ", " gli ", " sono ", "zione"),
    "pt" -> Seq(" os ", " que ", " uma ", " com ", " para ", " não ", " em ", " do ", " da ", "ção"),
    "nl" -> Seq(" de ", " het ", " een ", " en ", " van ", " is ", " niet ", " dat ", " met ", "ij"),
    "sv" -> Seq(" och ", " att ", " det ", " är ", " som ", " en ", " på ", " inte ", " för ", " med "),
    "da" -> Seq(" og ", " det ", " er ", " som ", " en ", " på ", " ikke ", " til ", " af ", " hvad "),
    "no" -> Seq(" og ", " det ", " er ", " som ", " en ", " på ", " ikke ", " til ", " av ", " hva "),
    "fi" -> Seq(" ja ", " on ", " ei ", " että ", "ssa ", "lla ", " mutta ", "inen ", " tämä ", "kin "),
    "pl" -> Seq(" nie ", " jest ", " się ", " na ", " do ", " że ", "ych ", " przez ", " tego ", " co "),
    "cs" -> Seq(" je ", " se ", " na ", " že ", " nebo ", " pro ", " který ", "ých ", " byl ", " ale "),
    "ro" -> Seq(" și ", " este ", " nu ", " de ", " la ", " cu ", " pentru ", " care ", " din ", " sunt "),
    "hu" -> Seq(" és ", " az ", " nem ", " hogy ", " van ", " egy ", "nak ", "nek ", "ban ", "ben "),
    "tr" -> Seq(" ve ", " bir ", " bu ", " için ", " ile ", " değil ", "lar ", "ler ", "dır ", " olarak "),
    "id" -> Seq(" dan ", " yang ", " di ", " ini ", " untuk ", " dengan ", " tidak ", " adalah ", " itu ", " pada "),
    "vi" -> Seq(" và ", " của ", " là ", " không ", " có ", " được ", " trong ", " người ", " này ", " một "),
    "sw" -> Seq(" na ", " ya ", " wa ", " kwa ", " ni ", " katika ", " kuwa ", " za ", " cha ", " sana "),
    "zh" -> Seq("的", "是", "了", "在", "和", "我", "有", "他", "这", "中")
  )

  /** Per-language char-n-gram coverage score over the padded
    * lowercased text — pure built-ins (whole-stage codegen). */
  private def profileScore(padded: Column, ngrams: Seq[String]): Column =
    ngrams.map(g => length(padded) - length(replace(padded, lit(g), lit(""))))
      .reduce(_ + _)

  /** Language-ID over the 20-language char-n-gram profiles: one score
    * per language, argmax via `array_max` over struct(score, lang)
    * (struct ordering is field-by-field: highest score wins, ties
    * break to the code-point-largest lang — deterministic), "und"
    * when no profile matches at all. Whole-stage codegen end to end —
    * no UDF; the same arithmetic is expressed in the q16 DuckDB
    * oracle. */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val padded = concat(lit(" "), lower(col(textCol)), lit(" "))
    val scored = LangProfiles.toSeq.sortBy(_._1).map { case (lang, ngrams) =>
      struct(profileScore(padded, ngrams).as("score"), lit(lang).as("lang"))
    }
    df.withColumn("_ls", array_max(array(scored: _*)))
      .withColumn("lang_pred",
        when(col("_ls.score") > 0, col("_ls.lang")).otherwise(lit("und")))
      .drop("_ls")
  }

  /** Embedded language-bearing evaluation corpus: authentic short
    * sentences per language (the provided `documents` table's `lang`
    * column is LABEL NOISE — its text is the same English-ish tech
    * vocabulary for every label, verified zero marker hits for
    * non-en labels — so model accuracy must be evidenced on text
    * that actually carries language signal). Used by TextOpsSpec's
    * accuracy gate (>= 0.95). */
  val LangSamples: Map[String, Seq[String]] = Map(
    "en" -> Seq("the weather is nice today and we are going to the park",
      "she said that you should read this book for the exam",
      "most of the results are consistent with the first study"),
    "de" -> Seq("der Hund und die Katze spielen nicht mit dem Ball",
      "das ist ein schönes Haus mit einem großen Garten",
      "ich bin nicht sicher ob der Zug schon abgefahren ist"),
    "es" -> Seq("el perro corre por el parque con los niños",
      "es una buena idea que vengas para la reunión",
      "la canción que escuchamos por la noche es muy bonita"),
    "fr" -> Seq("le chien court dans le jardin avec les enfants",
      "est ce que tu viens avec nous pour le dîner",
      "une bonne solution pour les problèmes est souvent simple et pas chère"),
    "it" -> Seq("il cane corre nel parco con i bambini",
      "non sono sicuro che questa sia una buona soluzione per il progetto",
      "gli studenti sono arrivati con una lezione da preparare"),
    "pt" -> Seq("os meninos estão a brincar no parque com uma bola",
      "não sei se esta é uma boa solução para o problema",
      "a canção que ouvimos do rádio é muito bonita"),
    "nl" -> Seq("de hond rent in het park met een bal",
      "ik weet niet of dit een goede oplossing is voor het probleem",
      "het huis van mijn ouders is niet ver van de stad"),
    "sv" -> Seq("hunden springer i parken och det är en fin dag",
      "jag vet inte om det här är en bra lösning på problemet",
      "det är viktigt att vi kommer i tid för mötet"),
    "da" -> Seq("hunden løber i parken og det er en fin dag af mange slags",
      "jeg ved ikke hvad det her er en god løsning på",
      "det er vigtigt at vi kommer til tiden af hensyn til mødet"),
    "no" -> Seq("hunden løper i parken og det er en fin dag av mange slag",
      "jeg vet ikke hva det her er en god løsning på",
      "det er viktig at vi kommer til tiden av hensyn til møtet"),
    "fi" -> Seq("koira juoksee puistossa ja on kaunis päivä",
      "en ole varma että tämä on hyvä ratkaisu mutta yritetään",
      "talossa on iso piha ja siellä on myös sauna ja järvikin"),
    "pl" -> Seq("pies biegnie przez park i to jest piękny dzień",
      "nie wiem czy to jest dobre rozwiązanie tego problemu",
      "ważne jest że przyjdziemy na czas do tego spotkania i co dalej"),
    "cs" -> Seq("pes běží parkem a je to krásný den",
      "nevím jestli je to dobré řešení pro tento problém nebo ne",
      "byl to dlouhý den ale projekt který jsme dokončili se povedl"),
    "ro" -> Seq("câinele aleargă în parc și este o zi frumoasă",
      "nu știu dacă aceasta este o soluție bună pentru problema din proiect",
      "este important să ajungem la timp pentru întâlnirea care urmează și sunt sigur"),
    "hu" -> Seq("a kutya fut a parkban és szép nap van ma",
      "nem tudom hogy ez egy jó megoldás a problémának",
      "fontos hogy időben érkezzünk meg az értekezletre a városban"),
    "tr" -> Seq("köpek parkta koşuyor ve bugün güzel bir gün",
      "bu sorun için iyi bir çözüm olup olmadığını bilmiyorum ama deneriz",
      "toplantılar için zamanında gelmek önemlidir ve bu bir kuraldır"),
    "id" -> Seq("anjing itu berlari di taman dan ini adalah hari yang indah",
      "saya tidak tahu apakah ini solusi yang baik untuk masalah ini",
      "penting untuk datang tepat waktu pada pertemuan dengan tim"),
    "vi" -> Seq("con chó chạy trong công viên và hôm nay là một ngày đẹp",
      "tôi không biết đây có phải là một giải pháp tốt cho vấn đề này không",
      "điều quan trọng là mọi người đến đúng giờ trong cuộc họp được tổ chức"),
    "sw" -> Seq("mbwa anakimbia katika bustani na ni siku nzuri sana",
      "sijui kama hii ni suluhisho nzuri kwa tatizo hili la kazi",
      "ni muhimu kuwa tunafika kwa wakati kwa mkutano wa timu ya cha chuo"),
    "zh" -> Seq("这只狗在公园里跑步今天是美好的一天",
      "我不知道这是不是解决这个问题的好办法",
      "重要的是我们要准时参加他和我在城里的会议中")
  )
}
