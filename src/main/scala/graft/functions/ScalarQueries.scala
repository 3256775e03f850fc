package graft.functions

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Scalar function families (SURVEY.md §2b "Scalar functions").
  *
  * Everything here is `org.apache.spark.sql.functions._` built-ins —
  * codegen'd, null-safe, whole-stage-compiled. No UDFs: at 100 TB a Scala
  * closure in the hot path breaks codegen and serializes per row; these
  * expressions stay inside one WholeStageCodegen span over the scan.
  */
object ScalarQueries {

  /** String functions: substr/upper/trim/concat/split/regexp/levenshtein. */
  val fnString: GraftQuery = GraftQuery(
    "fn_string",
    (s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .select(
          $"p_partkey",
          upper($"p_name").as("name_upper"),
          substring($"p_name", 1, 5).as("name_pfx"),
          length($"p_name").as("name_len"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
          size(split($"p_name", " ")).as("n_tokens"),
          regexp_extract($"p_brand", "Brand#(\\d+)", 1).as("brand_num"),
          levenshtein($"p_brand", lit("Brand#11")).as("lev_to_b11"),
          trim(lower($"p_type")).as("type_lower"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
                   upper(p_name) AS name_upper,
                   substr(p_name, 1, 5) AS name_pfx,
                   length(p_name) AS name_len,
                   concat_ws('|', p_brand, p_type) AS brand_type,
                   CAST(len(string_split(p_name, ' ')) AS INT) AS n_tokens,
                   regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
                   CAST(levenshtein(p_brand, 'Brand#11') AS INT) AS lev_to_b11,
                   trim(lower(p_type)) AS type_lower
            FROM part ORDER BY p_partkey""")
  )

  /** Date/time functions: year/month/day, date_trunc, datediff, intervals. */
  val fnDate: GraftQuery = GraftQuery(
    "fn_date",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("o_year"),
          month($"o_orderdate").as("o_month"),
          dayofmonth($"o_orderdate").as("o_day"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          datediff(lit("2002-01-01").cast("date"), $"o_orderdate".cast("date"))
            .as("days_to_2002"),
          ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("plus_30d"),
          quarter($"o_orderdate").as("o_quarter"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(month(o_orderdate) AS INT) AS o_month,
                   CAST(day(o_orderdate) AS INT) AS o_day,
                   date_trunc('month', o_orderdate) AS month_start,
                   CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
                     AS days_to_2002,
                   o_orderdate + INTERVAL 30 DAY AS plus_30d,
                   CAST(quarter(o_orderdate) AS INT) AS o_quarter
            FROM orders ORDER BY o_orderkey""")
  )

  /** Math functions: round/abs/ln/pow/sqrt/ceil/floor/mod. */
  val fnMath: GraftQuery = GraftQuery(
    "fn_math",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .select(
          $"l_orderkey", $"l_linenumber",
          round($"l_extendedprice", 1).as("price_r1"),
          round(abs($"l_discount" - 0.05), 6).as("disc_dev"),
          round(log($"l_extendedprice"), 6).as("price_ln"),
          round(pow($"l_quantity", 2.0), 2).as("qty_sq"),
          round(sqrt($"l_extendedprice"), 6).as("price_sqrt"),
          ceil($"l_quantity" / 7.0).cast("long").as("qty_ceil7"),
          floor($"l_quantity" / 7.0).cast("long").as("qty_floor7"),
          pmod($"l_orderkey", lit(97L)).as("okey_mod97"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice, 1) AS price_r1,
                   round(abs(l_discount - 0.05), 6) AS disc_dev,
                   round(ln(l_extendedprice), 6) AS price_ln,
                   round(pow(l_quantity, 2.0), 2) AS qty_sq,
                   round(sqrt(l_extendedprice), 6) AS price_sqrt,
                   CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
                   CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor7,
                   l_orderkey % 97 AS okey_mod97
            FROM lineitem ORDER BY l_orderkey, l_linenumber""")
  )

  /** JSON payload extraction — the reference's TimestampExtractor analogue
    * (schema-on-read over the opaque `props` payload). */
  val fnJson: GraftQuery = GraftQuery(
    "fn_json",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select(
          $"event_id",
          get_json_object($"props", "$.k").cast("int").as("k_val"))
        .withColumn("k_bucket", ($"k_val" / 10).cast("int"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
                   CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10.0) AS INT)
                     AS k_bucket
            FROM events ORDER BY event_id""")
  )

  /** Array functions over the embedding column: explode + per-row stats.
    * Elements are cast to double before any arithmetic so float/double
    * summation differences can't leak into the comparison. */
  val fnArray: GraftQuery = GraftQuery(
    "fn_array",
    (s, dir) => {
      import s.implicits._
      Tables.embeddings(s, dir)
        .select($"vec_id", explode($"embedding").as("e"))
        .select($"vec_id", $"e".cast("double").as("e"))
        .groupBy($"vec_id")
        .agg(
          count(lit(1)).as("dim"),
          max($"e").as("max_e"),
          min($"e").as("min_e"),
          round(sum($"e"), 4).as("sum_e"),
          round(sum($"e" * $"e"), 4).as("l2sq"))
        .orderBy($"vec_id")
    },
    Some("""SELECT vec_id, count(*) AS dim,
                   max(e) AS max_e, min(e) AS min_e,
                   round(sum(e), 4) AS sum_e,
                   round(sum(e * e), 4) AS l2sq
            FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS e FROM embeddings)
            GROUP BY vec_id ORDER BY vec_id""")
  )

  /** MapType operations: build a typed map from the payload + columns, then
    * map_keys / map_filter / transform_values / element_at / map_values.
    * The oracle computes the same scalars straight from the base columns —
    * the operator under test is the Spark-side MapType algebra, which all
    * runs codegen'd inside the scan's projection (no shuffle, no UDF).
    * floor() before int casts on both sides: Spark CAST(double AS INT)
    * truncates while DuckDB rounds, so the cast input is always integral. */
  val fnMap: GraftQuery = GraftQuery(
    "fn_map",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("m", map(
          lit("k"), get_json_object($"props", "$.k").cast("int"),
          lit("uid"), $"user_id".cast("int"),
          lit("v"), floor($"value" * 100).cast("int")))
        .select(
          $"event_id",
          size($"m").as("n_keys"),
          concat_ws(",", array_sort(map_keys($"m"))).as("keys_csv"),
          element_at($"m", "k").as("k_val"),
          concat_ws(",",
            array_sort(map_keys(map_filter($"m", (_, v) => v > 50)))).as("big_csv"),
          aggregate(map_values(transform_values($"m", (_, v) => v * 2)),
            lit(0), (acc, v) => acc + v).as("sum2"))
        .orderBy($"event_id")
    },
    Some("""WITH base AS (
              SELECT event_id,
                     CAST(json_extract_string(props, '$.k') AS INT) AS kv,
                     CAST(user_id AS INT) AS uv,
                     CAST(floor(value * 100) AS INT) AS vv
              FROM events)
            SELECT event_id,
                   3 AS n_keys,
                   'k,uid,v' AS keys_csv,
                   kv AS k_val,
                   concat_ws(',',
                     CASE WHEN kv > 50 THEN 'k' END,
                     CASE WHEN uv > 50 THEN 'uid' END,
                     CASE WHEN vv > 50 THEN 'v' END) AS big_csv,
                   2 * (kv + uv + vv) AS sum2
            FROM base ORDER BY event_id""")
  )

  /** Bitwise operators — the primitive layer under SimHash chunking,
    * bucket ids, and bloom-style membership tricks elsewhere in the
    * engine. All codegen'd long ops in the scan projection. */
  val fnBitwise: GraftQuery = GraftQuery(
    "fn_bitwise",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_id",
          ($"event_id".bitwiseAND(255L)).as("b_and"),
          ($"event_id".bitwiseOR(16L)).as("b_or"),
          ($"event_id".bitwiseXOR(85L)).as("b_xor"),
          shiftleft($"event_id", 2).as("b_shl"),
          shiftright($"event_id", 3).as("b_shr"),
          bit_count($"event_id").as("popcnt"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
                   event_id & 255 AS b_and,
                   event_id | 16 AS b_or,
                   xor(event_id, 85) AS b_xor,
                   event_id << 2 AS b_shl,
                   event_id >> 3 AS b_shr,
                   CAST(bit_count(event_id) AS INT) AS popcnt
            FROM events ORDER BY event_id""")
  )

  /** Dirty-payload resilience — the reference consumed raw Kafka bytes,
    * where malformed payloads are a fact of life. 1/7 of the JSON payloads
    * are deterministically corrupted, then parsed with from_json's
    * PERMISSIVE default: bad records surface as nulls to count and route
    * (a dead-letter bucket at scale), never as task failures. */
  val fnJsonDirty: GraftQuery = GraftQuery(
    "fn_json_dirty",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_id", $"event_type",
          when(pmod($"event_id", lit(7)) === 0, concat(lit("x"), $"props"))
            .otherwise($"props").as("p"))
        .withColumn("parsed",
          from_json($"p", org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             sum(when($"parsed".isNull || $"parsed.k".isNull, 1L).otherwise(0L))
               .as("n_corrupt"),
             sum(coalesce($"parsed.k".cast("long"), lit(0L))).as("sum_k"))
        .orderBy($"event_type")
    },
    Some("""WITH dirty AS (
              SELECT event_id, event_type,
                     CASE WHEN event_id % 7 = 0 THEN concat('x', props)
                          ELSE props END AS p
              FROM events)
            SELECT event_type, count(*) AS n,
                   CAST(sum(CASE WHEN json_valid(p) THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_corrupt,
                   CAST(sum(CASE WHEN json_valid(p)
                            THEN CAST(json_extract_string(p, '$.k') AS INT)
                            ELSE 0 END) AS BIGINT) AS sum_k
            FROM dirty GROUP BY event_type ORDER BY event_type""")
  )

  /** Regex function family over real document text: first-match extract,
    * run counting, whitespace squeeze, boolean match, split cardinality.
    * Patterns stay in the Java∩RE2 common dialect (character classes,
    * +) so both engines compile identical automata; Spark's
    * `regexp_replace` is global by default, so the oracle passes DuckDB's
    * explicit 'g' flag. All five are codegen'd scan projections — one
    * WholeStageCodegen span, no shuffle before the output sort. */
  val fnRegex: GraftQuery = GraftQuery(
    "fn_regex",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).select(
        $"doc_id",
        regexp_extract($"text", "[0-9]+", 0).as("first_num"),
        regexp_count($"text", lit("[aeiou]+")).as("n_vowel_runs"),
        length(regexp_replace($"text", "\\s+", " ")).as("squeezed_len"),
        $"text".rlike("[0-9]").cast("int").as("has_digit"),
        size(split($"text", " ")).as("n_space_tokens"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
                   regexp_extract(text, '[0-9]+') AS first_num,
                   CAST(len(regexp_extract_all(text, '[aeiou]+')) AS INT)
                     AS n_vowel_runs,
                   CAST(length(regexp_replace(text, '\s+', ' ', 'g')) AS INT)
                     AS squeezed_len,
                   CAST(regexp_matches(text, '[0-9]') AS INT) AS has_digit,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_space_tokens
            FROM documents ORDER BY doc_id""")
  )

  /** URL function family — the web-corpus column every curation pipeline
    * keys on (domain-level dedup, domain mixing, blocklists all start at
    * parse_url). The fixture ships no URL column, so one is SYNTHESIZED
    * deterministically from row fields (the mm_* payload trick) and then
    * parsed back with Spark's native parse_url expression: HOST for the
    * registrable-domain grouping key, PATH, QUERY, and the extracted
    * query parameter. DuckDB has no parse_url, so the oracle parses with
    * anchored regexes — RFC-shaped on these URLs, which is exactly the
    * verifiable subset. Everything is a codegen'd scan projection; the
    * per-domain rollup is one hash aggregate on a bounded key domain. */
  val fnUrl: GraftQuery = GraftQuery(
    "fn_url",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", $"lang", $"source", $"n_chars",
          concat(lit("https://"), $"source", lit(".example.org/"),
            $"lang", lit("/doc/"), $"doc_id", lit("?len="), $"n_chars")
            .as("url"))
        .select($"doc_id",
          callUDF("parse_url", $"url", lit("HOST")).as("host"),
          callUDF("parse_url", $"url", lit("PATH")).as("path"),
          callUDF("parse_url", $"url", lit("QUERY")).as("query"),
          callUDF("parse_url", $"url", lit("QUERY"), lit("len")).cast("long")
            .as("len_param"))
        .orderBy($"doc_id")
    },
    Some("""WITH u AS (
              SELECT doc_id,
                     'https://' || source || '.example.org/' || lang ||
                     '/doc/' || doc_id || '?len=' || n_chars AS url
              FROM documents)
            SELECT doc_id,
                   regexp_extract(url, 'https://([^/]+)/', 1) AS host,
                   regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
                   regexp_extract(url, '\?(.*)$', 1) AS query,
                   CAST(regexp_extract(url, 'len=([0-9]+)', 1) AS BIGINT)
                     AS len_param
            FROM u ORDER BY doc_id""")
  )

  /** Timezone-aware local-hour load profile — events bucketed by their
    * LOCAL hour of day in three markets (the follow-the-sun readout:
    * "when are New York / London / Tokyo users actually active?").
    * Naive hour-of-UTC profiles are the classic analytics bug this
    * operator exists to replace; the conversion must consult the IANA
    * tz database (offsets are political, not arithmetic).
    *
    * Cross-engine determinism: Spark's from_utc_timestamp reads the
    * JVM's tzdata, DuckDB's timezone() reads ICU — both implement IANA,
    * and the fixture's January window contains no DST transition in
    * any profiled zone, so the mapping is offset-stable (an ambiguous
    * fall-back hour is where two tzdata consumers may legitimately
    * disagree; pin the fixture window away from transitions or grade
    * per-zone offsets explicitly when extending). One scan projection
    * + one hash aggregate onto the 3×24 domain. */
  val fnTimezone: GraftQuery = GraftQuery(
    "fn_timezone",
    (s, dir) => {
      import s.implicits._
      val zones = Seq("America/New_York", "Europe/London", "Asia/Tokyo")
      val ev = Tables.events(s, dir)
      zones.map { z =>
        ev.select(lit(z).as("market"),
          hour(from_utc_timestamp($"ts", z)).cast("long").as("local_hour"))
      }.reduce(_.unionAll(_))
        .groupBy($"market", $"local_hour")
        .agg(count(lit(1)).as("n"))
        .orderBy($"market", $"local_hour")
    },
    Some("""WITH z AS (
              SELECT unnest(['America/New_York', 'Europe/London', 'Asia/Tokyo']) AS market),
            h AS (
              SELECT market,
                     -- timezone('UTC', ts) pins the naive→instant reading to
                     -- UTC regardless of the oracle session's TimeZone (a bare
                     -- CAST AS TIMESTAMPTZ inherits the host zone — only
                     -- accidentally UTC on a UTC box); the outer timezone()
                     -- then renders the instant as market-local wall time.
                     CAST(hour(timezone(market, timezone('UTC', ts))) AS BIGINT) AS local_hour
              FROM events CROSS JOIN z)
            SELECT market, local_hour, count(*) AS n
            FROM h GROUP BY 1, 2
            ORDER BY 1, 2""")
  )

  /** Per-partition table checksum — the cross-system integrity
    * primitive behind every replication / migration verification
    * ("does the copy hold exactly the source's rows?"): one
    * ORDER-INSENSITIVE 48-bit digest per day that two systems compute
    * independently and diff by partition, so a divergence localizes to
    * a day instead of a table.
    *
    * Mechanics: each row canonicalizes to a string over its key and
    * payload (money in exact CENTS — rendering a raw double is how
    * checksum twins drift), md5-hashes, and keeps the first 48 bits as
    * a BIGINT; the partition digest is BIT_XOR of the row hashes —
    * commutative, associative, closed on 64 bits (a SUM checksum
    * overflows exactly when the table gets big enough to matter).
    * Collision note: XOR cancels DUPLICATE PAIRS of identical rows —
    * the row string therefore includes the unique event_id. One scan
    * projection + one hash aggregate onto the day domain. */
  val fnChecksum: GraftQuery = GraftQuery(
    "fn_checksum",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select(to_date($"ts").as("d"),
          expr("""CAST(conv(substring(md5(concat(
                    CAST(event_id AS STRING), '|', event_type, '|',
                    CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS STRING)
                  )), 1, 12), 16, 10) AS BIGINT)""").as("h"))
        .groupBy($"d")
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("checksum"))
        .orderBy($"d")
    },
    Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n,
                   bit_xor(CAST(('0x' || substr(md5(
                     CAST(event_id AS VARCHAR) || '|' || event_type || '|' ||
                     CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)
                   ), 1, 12)) AS BIGINT)) AS checksum
            FROM events GROUP BY 1 ORDER BY 1""")
  )

  def all: Seq[GraftQuery] =
    Seq(fnString, fnDate, fnMath, fnJson, fnArray, fnMap, fnBitwise, fnJsonDirty,
      fnRegex, fnUrl, fnTimezone, fnChecksum)
}
