package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipelines.CleaningPipelines
import Queries.Q

/** Demo queries for the cleaning pipelines (SURVEY.md §2.10 M2-M7): each
  * synthesizes a deterministic dirty all-string table from the TPC-H-ish
  * test data (FIXTURES.md fault taxonomy), runs the pipeline, and returns
  * the clean or quarantine partition. The DuckDB oracles replicate every
  * cleaning step in SQL — including title-casing (DuckDB has no initcap),
  * the ffill+1 id-repair window, and keep-first dedup by ingest order.
  */
object QueriesClean {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)   // schema-cached parquet read (see Tables)

  // DuckDB title-case emulation (initcap equivalent after whitespace
  // collapse): upper first letter, lower rest, per space-separated word.
  private val duckTitle =
    """array_to_string(list_transform(
      |  string_split(regexp_replace(trim(%s), '\s+', ' ', 'g'), ' '),
      |  w -> upper(w[1:1]) || lower(w[2:])), ' ')""".stripMargin

  // ---------------------------------------------------------------- q36
  // M3 airlines pipeline — clean partition.
  private def airlinesInput(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    c.select(
      col("c_custkey").cast(LongType).as(CleaningPipelines.IngestId),
      // 2-letter key from custkey, with deterministic dirt: lowercase,
      // length-violating suffix, padding
      (concat(chr(col("c_custkey") % 26 + 65), chr((col("c_custkey") / 26) % 26 + 65)))
        .as("_k0"),
      regexp_replace(lower(col("c_name")), "#", " ").as("_n0"),
      element_at(typedLit(Seq("oneworld", "SKY TEAM", "staralliance",
        "Star Alliance", "none", "garbage", "", "SkyTeam")),
        (col("c_custkey") % 8 + 1).cast(IntegerType)).as("alliance"))
      .withColumn("airlinekey",
        when(col(CleaningPipelines.IngestId) % 7 === 0, lower(col("_k0")))
          .when(col(CleaningPipelines.IngestId) % 11 === 0, concat(col("_k0"), lit("XXX")))
          .when(col(CleaningPipelines.IngestId) % 13 === 0, concat(lit("  "), col("_k0"), lit(" ")))
          .otherwise(col("_k0")))
      .withColumn("airlinename",
        when(col(CleaningPipelines.IngestId) % 17 === 0, lit(null).cast(StringType))
          .when(col(CleaningPipelines.IngestId) % 5 === 0,
            regexp_replace(col("_n0"), " ", "   ")).otherwise(col("_n0")))
      .drop("_k0", "_n0")
  }

  private val airlinesInputSql =
    """raw AS (
      |  SELECT c_custkey AS _ingest_id,
      |         chr(CAST(c_custkey % 26 + 65 AS INT)) || chr(CAST(c_custkey // 26 % 26 + 65 AS INT)) AS k0,
      |         regexp_replace(lower(c_name), '#', ' ', 'g') AS n0,
      |         ['oneworld','SKY TEAM','staralliance','Star Alliance','none','garbage','','SkyTeam'][CAST(c_custkey % 8 + 1 AS INT)] AS alliance
      |  FROM customer),
      |inp AS (
      |  SELECT _ingest_id,
      |         CASE WHEN _ingest_id % 7 = 0 THEN lower(k0)
      |              WHEN _ingest_id % 11 = 0 THEN k0 || 'XXX'
      |              WHEN _ingest_id % 13 = 0 THEN '  ' || k0 || ' '
      |              ELSE k0 END AS airlinekey,
      |         CASE WHEN _ingest_id % 17 = 0 THEN NULL
      |              WHEN _ingest_id % 5 = 0 THEN regexp_replace(n0, ' ', '   ', 'g') ELSE n0 END AS airlinename,
      |         alliance
      |  FROM raw),
      |norm AS (
      |  SELECT _ingest_id,
      |         upper(trim(airlinekey)) AS airlinekey,
      |         coalesce(TITLE(airlinename), upper(trim(airlinekey))) AS airlinename,
      |         CASE WHEN upper(trim(airlinekey)) = 'VS' THEN 'SkyTeam'
      |              WHEN upper(trim(airlinekey)) = 'AZ' THEN 'None'
      |              ELSE (CASE lower(trim(alliance))
      |                      WHEN 'skyteam' THEN 'SkyTeam' WHEN 'sky team' THEN 'SkyTeam'
      |                      WHEN 'star alliance' THEN 'Star Alliance' WHEN 'staralliance' THEN 'Star Alliance'
      |                      WHEN 'oneworld' THEN 'Oneworld' WHEN 'one world' THEN 'Oneworld'
      |                      WHEN 'none' THEN lower(trim(alliance))
      |                      ELSE coalesce(lower(trim(alliance)), '') END)
      |         END AS alliance0
      |  FROM inp),
      |norm2 AS (
      |  SELECT _ingest_id, airlinekey, airlinename,
      |         CASE WHEN alliance0 IN ('Oneworld','SkyTeam','Star Alliance','None') THEN alliance0 ELSE 'None' END AS alliance
      |  FROM norm),
      |flagged AS (
      |  SELECT *, row_number() OVER (PARTITION BY airlinekey ORDER BY _ingest_id) > 1 AS isdup
      |  FROM norm2)""".stripMargin
      .replace("TITLE(airlinename)", duckTitle.format("airlinename"))

  private val q36 = Q("q36_airlines_clean",
    (s, dir) => CleaningPipelines.airlines(airlinesInput(s, dir)).clean
      .select(col(CleaningPipelines.IngestId), col("airlinekey"),
        col("airlinename"), col("alliance")),
    Some(s"""WITH $airlinesInputSql
             SELECT _ingest_id, airlinekey, airlinename, alliance
             FROM flagged
             WHERE regexp_matches(airlinekey, '^[A-Z0-9]{2,3}$$')
               AND regexp_matches(airlinename, '^[A-Za-z0-9\\s\\.\\-\\&]+$$')
               AND NOT isdup"""))

  // ---------------------------------------------------------------- q37/q38
  // M2 transactions pipeline — clean + quarantine partitions.
  private def transactionsInput(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val k = col("o_orderkey") % 7013 // shared row seed → exact-dup groups
    def money(mul: Int, off: Int): Column = {
      val cents = (k * mul + off) % 1000000L
      concat(lit("$"), format_number((cents / 100).cast(LongType), 0),
        lit("."), lpad((cents % 100).cast(StringType), 2, "0"))
    }
    o.select(
      col("o_orderkey").cast(LongType).as(CleaningPipelines.IngestId),
      when(k % 97 === 0, lit("4AN"))
        .otherwise((lit(40000L) + (k * 7) % 9999L).cast(StringType)).as("transactionid"),
      when(k % 89 === 0, lit("not-a-date"))
        .when(k % 4 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .when(k % 4 === 1, date_format(col("o_orderdate"), "dd/MM/yyyy"))
        .when(k % 4 === 2, date_format(col("o_orderdate"), "MM/dd/yyyy"))
        .otherwise(date_format(col("o_orderdate"), "yyyy/MMM/dd")).as("transactiondate"),
      // genuinely-NULL ids (not just empty strings) — a NULL validator
      // result must quarantine the row, never drop it from both partitions
      when(k % 101 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("P"), lpad(((k * 3) % 90000L).cast(StringType), 5, "0")))
        .as("passengerid"),
      when(k % 83 === 0, lit(""))
        .when(k % 103 === 0, lit(null).cast(StringType))
        .otherwise(concat(chr(k % 26 + 65), (k % 99999L + 1).cast(StringType))).as("flightid"),
      when(k % 107 === 0, lit(null).cast(StringType))
        .otherwise(money(11, 3)).as("ticketprice"), money(13, 7).as("taxes"),
      money(17, 1).as("baggagefees"), money(19, 9).as("totalamount"))
  }

  private val transactionsSql =
    """raw AS (
      |  SELECT o_orderkey AS _ingest_id, o_orderkey % 7013 AS k, o_orderdate FROM orders),
      |inp AS (
      |  SELECT _ingest_id,
      |    CASE WHEN k % 97 = 0 THEN '4AN' ELSE CAST(40000 + (k*7) % 9999 AS VARCHAR) END AS transactionid,
      |    CASE WHEN k % 89 = 0 THEN 'not-a-date'
      |         WHEN k % 4 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
      |         WHEN k % 4 = 1 THEN strftime(o_orderdate, '%d/%m/%Y')
      |         WHEN k % 4 = 2 THEN strftime(o_orderdate, '%m/%d/%Y')
      |         ELSE strftime(o_orderdate, '%Y/%b/%d') END AS transactiondate,
      |    CASE WHEN k % 101 = 0 THEN NULL ELSE 'P' || lpad(CAST((k*3) % 90000 AS VARCHAR), 5, '0') END AS passengerid,
      |    CASE WHEN k % 83 = 0 THEN '' WHEN k % 103 = 0 THEN NULL ELSE chr(CAST(k % 26 + 65 AS INT)) || CAST(k % 99999 + 1 AS VARCHAR) END AS flightid,
      |    CASE WHEN k % 107 = 0 THEN NULL ELSE '$' || format('{:,}', ((k*11+3) % 1000000) // 100) || '.' || lpad(CAST((k*11+3) % 100 AS VARCHAR), 2, '0') END AS ticketprice,
      |    '$' || format('{:,}', ((k*13+7) % 1000000) // 100) || '.' || lpad(CAST((k*13+7) % 100 AS VARCHAR), 2, '0') AS taxes,
      |    '$' || format('{:,}', ((k*17+1) % 1000000) // 100) || '.' || lpad(CAST((k*17+1) % 100 AS VARCHAR), 2, '0') AS baggagefees,
      |    '$' || format('{:,}', ((k*19+9) % 1000000) // 100) || '.' || lpad(CAST((k*19+9) % 100 AS VARCHAR), 2, '0') AS totalamount
      |  FROM raw),
      |rep AS (
      |  SELECT _ingest_id,
      |    CAST(coalesce(
      |      CASE WHEN regexp_matches(transactionid, '^[0-9]+$') THEN CAST(transactionid AS BIGINT) END,
      |      coalesce(last_value(CASE WHEN regexp_matches(transactionid, '^[0-9]+$') THEN CAST(transactionid AS BIGINT) END IGNORE NULLS)
      |                 OVER (ORDER BY _ingest_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 40000) + 1
      |    ) AS VARCHAR) AS transactionid,
      |    CASE WHEN p IS NOT NULL THEN strftime(p, '%Y-%m-%d') END AS transactiondate,
      |    passengerid, flightid,
      |    CASE WHEN ticketprice IS NULL THEN NULL ELSE least(round(CAST(replace(replace(ticketprice, '$', ''), ',', '') AS DOUBLE), 2), 99999999.99) END AS ticketprice,
      |    CASE WHEN taxes IS NULL THEN NULL ELSE least(round(CAST(replace(replace(taxes, '$', ''), ',', '') AS DOUBLE), 2), 99999999.99) END AS taxes,
      |    CASE WHEN baggagefees IS NULL THEN NULL ELSE least(round(CAST(replace(replace(baggagefees, '$', ''), ',', '') AS DOUBLE), 2), 99999999.99) END AS baggagefees,
      |    CASE WHEN totalamount IS NULL THEN NULL ELSE least(round(CAST(replace(replace(totalamount, '$', ''), ',', '') AS DOUBLE), 2), 99999999.99) END AS totalamount
      |  FROM (SELECT *,
      |          coalesce(try_strptime(trim(transactiondate), '%Y-%m-%d'),
      |                   try_strptime(trim(transactiondate), '%d/%m/%Y'),
      |                   try_strptime(trim(transactiondate), '%m/%d/%Y'),
      |                   try_strptime(trim(transactiondate), '%Y/%m/%d'),
      |                   try_strptime(trim(transactiondate), '%d-%m-%Y'),
      |                   try_strptime(replace(trim(transactiondate), '-', '/'), '%Y/%b/%d'),
      |                   try_strptime(trim(transactiondate), '%d-%b-%y')) AS p
      |        FROM inp)),
      |flagged AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY transactionid, transactiondate, passengerid, flightid,
      |                                    ticketprice, taxes, baggagefees, totalamount
      |                       ORDER BY _ingest_id) > 1 AS rowdup,
      |    row_number() OVER (PARTITION BY transactionid ORDER BY _ingest_id) > 1 AS iddup
      |  FROM rep),
      |judged AS (
      |  SELECT *,
      |    (regexp_matches(transactionid, '^4[0-9]{4}$')
      |     AND transactiondate IS NOT NULL
      |     AND regexp_matches(passengerid, '^P[0-8][0-9]{4}$')
      |     AND regexp_matches(flightid, '^[A-Z]{1,2}[0-9]{1,5}$')
      |     AND NOT rowdup AND NOT iddup) AS ok
      |  FROM flagged)""".stripMargin

  private val txnCols = Seq("_ingest_id", "transactionid", "transactiondate",
    "passengerid", "flightid", "ticketprice", "taxes", "baggagefees", "totalamount")

  private val q37 = Q("q37_transactions_clean",
    (s, dir) => CleaningPipelines.transactions(transactionsInput(s, dir)).clean
      .select(txnCols.map(col): _*),
    Some(s"""WITH $transactionsSql
             SELECT ${txnCols.mkString(", ")} FROM judged WHERE ok"""))

  private val q38 = Q("q38_transactions_quarantine",
    (s, dir) => CleaningPipelines.transactions(transactionsInput(s, dir)).quarantine
      .select(txnCols.map(col): _*),
    Some(s"""WITH $transactionsSql
             SELECT ${txnCols.mkString(", ")} FROM judged WHERE ok IS NOT TRUE"""))

  // ---------------------------------------------------------------- q39
  // M5 passengers pipeline — clean partition.
  private def passengersInput(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val k = col("c_custkey")
    val first = element_at(typedLit(Seq("john", "mary", "alice", "bob", "eve")),
      (k % 5 + 1).cast(IntegerType))
    val last0 = element_at(typedLit(Seq("smith", "jones", "lee", "brown", "chen")),
      (k % 7 % 5 + 1).cast(IntegerType))
    val key = concat(lit("P"), lpad((k % 90000).cast(StringType), 5, "0"))
    c.select(
      k.cast(LongType).as(CleaningPipelines.IngestId),
      when(k % 19 === 0, lit("")).otherwise(key).as("passengerkey"),
      when(k % 23 === 0, first)
        .when(k % 3 === 0, concat(upper(first), lit(" "), last0))
        .otherwise(concat(first, lit(" "), last0)).as("fullname"),
      when(k % 37 === 0, lit(null).cast(StringType))
        .when(k % 29 === 0, concat(first, lit("."), last0, lit("@other.com")))
        .otherwise(concat(first, lit("."), last0,
          regexp_replace(key, "[^0-9]", ""), lit("@example.com"))).as("email"),
      element_at(typedLit(Seq("gold", "SILVER", "Bronze ", "platinum!", "copper")),
        (k % 5 + 1).cast(IntegerType)).as("loyaltystatus"))
  }

  private val passengersSql =
    """raw AS (
      |  SELECT c_custkey AS _ingest_id,
      |         ['john','mary','alice','bob','eve'][CAST(c_custkey % 5 + 1 AS INT)] AS fn,
      |         ['smith','jones','lee','brown','chen'][CAST(c_custkey % 7 % 5 + 1 AS INT)] AS ln,
      |         'P' || lpad(CAST(c_custkey % 90000 AS VARCHAR), 5, '0') AS pk
      |  FROM customer),
      |inp AS (
      |  SELECT _ingest_id,
      |         CASE WHEN _ingest_id % 19 = 0 THEN '' ELSE pk END AS passengerkey,
      |         CASE WHEN _ingest_id % 23 = 0 THEN fn
      |              WHEN _ingest_id % 3 = 0 THEN upper(fn) || ' ' || ln
      |              ELSE fn || ' ' || ln END AS fullname,
      |         CASE WHEN _ingest_id % 37 = 0 THEN NULL
      |              WHEN _ingest_id % 29 = 0 THEN fn || '.' || ln || '@other.com'
      |              ELSE fn || '.' || ln || regexp_replace(pk, '[^0-9]', '', 'g') || '@example.com' END AS email,
      |         ['gold','SILVER','Bronze ','platinum!','copper'][CAST(_ingest_id % 5 + 1 AS INT)] AS ls
      |  FROM raw),
      |norm AS (
      |  SELECT _ingest_id,
      |         trim(passengerkey) AS passengerkey,
      |         lower(trim(
      |           CASE WHEN dg <> '' AND nopad IS NOT NULL AND len(nopad) > 0
      |                THEN replace(replace(email, dg, ''), nopad, '')
      |                WHEN dg <> '' THEN replace(email, dg, '')
      |                ELSE email END)) AS email,
      |         TITLE(fullname) AS fullname,
      |         upper(stripped[1:1]) || lower(stripped[2:]) AS loyaltystatus
      |  FROM (SELECT *,
      |          regexp_replace(trim(passengerkey), '[^0-9]', '', 'g') AS dg,
      |          CAST(TRY_CAST(regexp_replace(trim(passengerkey), '[^0-9]', '', 'g') AS BIGINT) AS VARCHAR) AS nopad,
      |          regexp_replace(trim(ls), '[^a-zA-Z]', '', 'g') AS stripped
      |        FROM inp)),
      |flagged AS (
      |  SELECT *, row_number() OVER (PARTITION BY fullname, email, loyaltystatus ORDER BY _ingest_id) > 1 AS isdup
      |  FROM norm)""".stripMargin
      .replace("TITLE(fullname)", duckTitle.format("fullname"))

  private val q39 = Q("q39_passengers_clean",
    (s, dir) => CleaningPipelines.passengers(passengersInput(s, dir)).clean
      .select(col(CleaningPipelines.IngestId), col("passengerkey"),
        col("fullname"), col("email"), col("loyaltystatus")),
    Some(s"""WITH $passengersSql
             SELECT _ingest_id, passengerkey, fullname, email, loyaltystatus
             FROM flagged
             WHERE passengerkey IS NOT NULL AND length(trim(passengerkey)) > 0
               AND fullname IS NOT NULL AND length(trim(fullname)) > 0
               AND email IS NOT NULL AND length(trim(email)) > 0
               AND loyaltystatus IS NOT NULL AND length(trim(loyaltystatus)) > 0
               AND regexp_matches(fullname, '^[A-Za-z]+(?:\\s+[A-Za-z]+)+$$')
               AND regexp_matches(email, '^[a-z0-9]+(?:[._][a-z0-9]+)*@example\\.com$$')
               AND loyaltystatus IN ('Bronze','Silver','Gold','Platinum')
               AND NOT isdup"""))

  // ---------------------------------------------------------------- q40
  // M4 flights pipeline — fuzzy repair path. The oracle replicates the
  // WHOLE pipeline in SQL, including both fuzzy-repair steps' scoring
  // algebra (DuckDB has levenshtein, the q14 pattern) — so the >=85
  // accept/reject gate, the prefix splice, and the keep-first dedup are
  // all hash-checked, not just row-counted.
  private val q40 = Q("q40_flights_clean",
    (s, dir) => {
      val n = t(s, dir, "nation")
      // airline dim: 2-letter keys; airport dim: 3-letter codes
      val airlines = n.select(concat(chr(col("n_nationkey") % 26 + 65),
        chr((col("n_nationkey") * 7) % 26 + 65)).as("airlinekey")).distinct()
      val airports = n.select(concat(chr(col("n_nationkey") % 26 + 65),
        chr((col("n_nationkey") * 3) % 26 + 65),
        chr((col("n_nationkey") * 5) % 26 + 65)).as("airportkey")).distinct()
      val o = t(s, dir, "orders")
      val k = col("o_orderkey") % 1000
      val input = o.select(
        col("o_orderkey").cast(LongType).as(CleaningPipelines.IngestId),
        concat(chr(k % 26 + 65), chr((k * 7) % 26 + 65),
          (k % 9999 + 1).cast(StringType)).as("flightkey"),
        when(k % 31 === 0, lit("JK"))
          .otherwise(concat(chr(k % 26 + 65), chr((k * 3) % 26 + 65),
            chr((k * 5) % 26 + 65))).as("originairportkey"),
        concat(chr((k + 1) % 26 + 65), chr(((k + 1) * 3) % 26 + 65),
          chr(((k + 1) * 5) % 26 + 65)).as("destinationairportkey"),
        when(k % 41 === 0, lit(null).cast(StringType))
          .otherwise(element_at(typedLit(Seq("boeing  737", "AIRBUS a320", "embraer 190")),
            (k % 3 + 1).cast(IntegerType))).as("aircrafttype"))
      CleaningPipelines.flights(input, airlines, "airlinekey",
          airports, "airportkey").clean
        .select(col(CleaningPipelines.IngestId), col("flightkey"),
          col("originairportkey"), col("destinationairportkey"),
          col("aircrafttype"))
    },
    Some(s"""WITH airlines AS (
               SELECT DISTINCT chr(CAST(n_nationkey % 26 + 65 AS INT)) ||
                 chr(CAST(n_nationkey * 7 % 26 + 65 AS INT)) AS airlinekey FROM nation),
             airports AS (
               SELECT DISTINCT chr(CAST(n_nationkey % 26 + 65 AS INT)) ||
                 chr(CAST(n_nationkey * 3 % 26 + 65 AS INT)) ||
                 chr(CAST(n_nationkey * 5 % 26 + 65 AS INT)) AS airportkey FROM nation),
             raw AS (SELECT o_orderkey AS _ingest_id, o_orderkey % 1000 AS k FROM orders),
             inp AS (
               SELECT _ingest_id,
                 chr(CAST(k % 26 + 65 AS INT)) || chr(CAST(k * 7 % 26 + 65 AS INT)) ||
                   CAST(k % 9999 + 1 AS VARCHAR) AS flightkey,
                 CASE WHEN k % 31 = 0 THEN 'JK'
                      ELSE chr(CAST(k % 26 + 65 AS INT)) || chr(CAST(k * 3 % 26 + 65 AS INT)) ||
                           chr(CAST(k * 5 % 26 + 65 AS INT)) END AS originairportkey,
                 chr(CAST((k + 1) % 26 + 65 AS INT)) || chr(CAST((k + 1) * 3 % 26 + 65 AS INT)) ||
                   chr(CAST((k + 1) * 5 % 26 + 65 AS INT)) AS destinationairportkey,
                 CASE WHEN k % 41 = 0 THEN NULL
                      ELSE ['boeing  737','AIRBUS a320','embraer 190'][CAST(k % 3 + 1 AS INT)]
                 END AS aircrafttype
               FROM raw),
             norm AS (
               SELECT _ingest_id,
                 upper(trim(flightkey)) AS flightkey,
                 CASE WHEN upper(trim(originairportkey)) = 'JK' THEN 'JFK'
                      ELSE upper(trim(originairportkey)) END AS originairportkey,
                 upper(trim(destinationairportkey)) AS destinationairportkey,
                 TITLE(aircrafttype) AS aircrafttype
               FROM inp),
             pref AS (
               SELECT *,
                 upper(substr(regexp_replace(flightkey, '[^A-Za-z0-9]', '', 'g'), 1, 2)) AS pfx,
                 substr(regexp_replace(flightkey, '[^A-Za-z0-9]', '', 'g'), 3) AS sfx
               FROM norm),
             pbest AS (
               SELECT pfx, cand, score FROM (
                 SELECT m.pfx, a.airlinekey AS cand,
                        100.0 * (1.0 - CAST(levenshtein(upper(m.pfx), upper(a.airlinekey)) AS DOUBLE)
                          / greatest(length(m.pfx), length(a.airlinekey))) AS score
                 FROM (SELECT DISTINCT pfx FROM pref p
                       WHERE NOT EXISTS (SELECT 1 FROM airlines a WHERE a.airlinekey = p.pfx)) m
                 CROSS JOIN airlines a)
               QUALIFY row_number() OVER (PARTITION BY pfx ORDER BY score DESC, cand) = 1),
             fixed1 AS (
               SELECT _ingest_id,
                 coalesce(CASE WHEN b.score >= 85.0 THEN b.cand END, p.pfx) || p.sfx AS flightkey,
                 originairportkey, destinationairportkey, aircrafttype
               FROM pref p LEFT JOIN pbest b ON p.pfx = b.pfx),
             obest AS (
               SELECT v, cand, score FROM (
                 SELECT m.v, a.airportkey AS cand,
                        100.0 * (1.0 - CAST(levenshtein(upper(m.v), upper(a.airportkey)) AS DOUBLE)
                          / greatest(length(m.v), length(a.airportkey))) AS score
                 FROM (SELECT DISTINCT originairportkey AS v FROM fixed1 f
                       WHERE NOT EXISTS (SELECT 1 FROM airports a WHERE a.airportkey = f.originairportkey)) m
                 CROSS JOIN airports a)
               QUALIFY row_number() OVER (PARTITION BY v ORDER BY score DESC, cand) = 1),
             fixed2 AS (
               SELECT _ingest_id, flightkey,
                 coalesce(CASE WHEN b.score >= 85.0 THEN b.cand END, f.originairportkey) AS originairportkey,
                 destinationairportkey, aircrafttype
               FROM fixed1 f LEFT JOIN obest b ON f.originairportkey = b.v),
             dbest AS (
               SELECT v, cand, score FROM (
                 SELECT m.v, a.airportkey AS cand,
                        100.0 * (1.0 - CAST(levenshtein(upper(m.v), upper(a.airportkey)) AS DOUBLE)
                          / greatest(length(m.v), length(a.airportkey))) AS score
                 FROM (SELECT DISTINCT destinationairportkey AS v FROM fixed2 f
                       WHERE NOT EXISTS (SELECT 1 FROM airports a WHERE a.airportkey = f.destinationairportkey)) m
                 CROSS JOIN airports a)
               QUALIFY row_number() OVER (PARTITION BY v ORDER BY score DESC, cand) = 1),
             fixed3 AS (
               SELECT _ingest_id, flightkey, originairportkey,
                 coalesce(CASE WHEN b.score >= 85.0 THEN b.cand END, f.destinationairportkey) AS destinationairportkey,
                 aircrafttype
               FROM fixed2 f LEFT JOIN dbest b ON f.destinationairportkey = b.v),
             flagged AS (
               SELECT *, row_number() OVER (PARTITION BY flightkey ORDER BY _ingest_id) > 1 AS isdup
               FROM fixed3)
             SELECT _ingest_id, flightkey, originairportkey, destinationairportkey, aircrafttype
             FROM flagged
             WHERE regexp_matches(flightkey, '^[A-Za-z0-9]{2}[0-9]+$$')
               AND regexp_matches(originairportkey, '^[A-Za-z]{3}$$')
               AND regexp_matches(destinationairportkey, '^[A-Za-z]{3}$$')
               AND originairportkey <> destinationairportkey
               AND NOT isdup"""
      .replace("TITLE(aircrafttype)", duckTitle.format("aircrafttype"))))

  // ---------------------------------------------------------------- q41
  // M7 airline-sales pipeline — clean partition.
  private val q41 = Q("q41_airlinesales_clean",
    (s, dir) => {
      // two synthetic sale rows per order (explode) → guaranteed-unique
      // ingest ids, natural transactionid dups across orders via % 2011.
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), explode(array(lit(1), lit(2))).as("i"))
      val cents = (col("o_orderkey") * 31 + col("i") * 7) % 10000000L
      val input = o.select(
        (col("o_orderkey") * 10 + col("i")).cast(LongType)
          .as(CleaningPipelines.IngestId),
        when(col("o_orderkey") % 59 === 0, lit(null).cast(StringType))
          .when(col("o_orderkey") % 53 === 0, lit(""))
          .otherwise((col("o_orderkey") % 2011L).cast(StringType)).as("transactionid"),
        concat(lit("$"), format_number((cents / 100).cast(LongType), 0),
          lit("."), lpad((cents % 100).cast(StringType), 2, "0")).as("ticketprice"))
      CleaningPipelines.airlinesales(input).clean
    },
    Some("""WITH inp AS (
              SELECT o_orderkey * 10 + i AS _ingest_id,
                     CASE WHEN o_orderkey % 59 = 0 THEN NULL
                          WHEN o_orderkey % 53 = 0 THEN '' ELSE CAST(o_orderkey % 2011 AS VARCHAR) END AS transactionid,
                     '$' || format('{:,}', ((o_orderkey*31 + i*7) % 10000000) // 100) || '.' ||
                       lpad(CAST((o_orderkey*31 + i*7) % 100 AS VARCHAR), 2, '0') AS ticketprice
              FROM orders, (SELECT unnest([1, 2]) AS i)),
            norm AS (
              SELECT _ingest_id, transactionid,
                     least(round(CAST(replace(replace(ticketprice, '$', ''), ',', '') AS DOUBLE), 2), 99999999.99) AS ticketprice
              FROM inp),
            flagged AS (
              SELECT *, row_number() OVER (PARTITION BY transactionid ORDER BY _ingest_id) > 1 AS isdup
              FROM norm)
            SELECT _ingest_id, transactionid, ticketprice FROM flagged
            WHERE transactionid IS NOT NULL AND length(trim(transactionid)) > 0 AND NOT isdup"""))

  // ---------------------------------------------------------------- q137/q138
  // JSONL ingest, oracle-gated end-to-end (the round-10 source's only
  // gap): render `documents` to a real JSONL landing with four planted
  // corruption classes on disjoint doc_id residues — truncated JSON
  // (%23), blank line (%29), required key ABSENT (%31), required key
  // explicitly null (%37) — then read it back through
  // JsonlSource.readSplit and return each partition. Corrupt lines are
  // built by plain concat (no escaping) so the DuckDB oracle replays
  // them byte-for-byte; clean lines go through to_json and the oracle
  // checks the round-trip recovers the TABLE values exactly. _ingest_id
  // is deliberately not selected: monotonic ids depend on file/split
  // layout (spec-covered in JsonlSourceSpec), while the parse/split
  // semantics are what the oracle gates.
  private[graft] val jsonlSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType)))

  private[graft] val jsonlCleanSql =
    """SELECT doc_id, lang, text FROM documents
       WHERE NOT (doc_id % 23 = 0 OR doc_id % 29 = 0
                  OR doc_id % 31 = 0 OR doc_id % 37 = 0)"""

  private[graft] def jsonlLanding(s: SparkSession, dir: String, prefix: String): String = {
    val path = graft.streaming.StreamHarness.scratch(prefix)
    val d = t(s, dir, "documents")
    val k = col("doc_id")
    val id = k.cast(StringType)
    val line = when(k % 23 === 0,
        concat(lit("{\"doc_id\":"), id, lit(",\"lang\":\""), col("lang"),
          lit("\",\"text\":")))
      .when(k % 29 === 0, lit(""))
      .when(k % 31 === 0,
        concat(lit("{\"doc_id\":"), id, lit(",\"lang\":\""), col("lang"),
          lit("\"}")))
      .when(k % 37 === 0,
        concat(lit("{\"doc_id\":"), id, lit(",\"lang\":\""), col("lang"),
          lit("\",\"text\":null}")))
      .otherwise(to_json(struct(col("doc_id"), col("lang"), col("text"))))
    d.select(line.as("value")).write.mode("overwrite").text(path)
    path
  }

  private val q137 = Q("q137_jsonl_clean",
    (s, dir) => {
      val path = jsonlLanding(s, dir, "jsonl_q137")
      val (clean, _) = graft.sources.JsonlSource.readSplit(s, path,
        jsonlSchema, required = Seq("text"))
      clean.select(col("doc_id"), col("lang"), col("text"))
    },
    Some(jsonlCleanSql))

  private val q138 = Q("q138_jsonl_quarantine",
    (s, dir) => {
      val path = jsonlLanding(s, dir, "jsonl_q138")
      val (_, quarantine) = graft.sources.JsonlSource.readSplit(s, path,
        jsonlSchema, required = Seq("text"))
      quarantine.select(col("raw_line"), col("reason"))
    },
    Some("""SELECT CASE
              WHEN doc_id % 23 = 0 THEN '{"doc_id":' || CAST(doc_id AS VARCHAR) || ',"lang":"' || lang || '","text":'
              WHEN doc_id % 29 = 0 THEN ''
              WHEN doc_id % 31 = 0 THEN '{"doc_id":' || CAST(doc_id AS VARCHAR) || ',"lang":"' || lang || '"}'
              ELSE '{"doc_id":' || CAST(doc_id AS VARCHAR) || ',"lang":"' || lang || '","text":null}' END AS raw_line,
            CASE WHEN doc_id % 23 = 0 THEN 'invalid_json'
                 WHEN doc_id % 29 = 0 THEN 'blank_line'
                 WHEN doc_id % 31 = 0 THEN 'missing_required_field'
                 ELSE 'null_required_field' END AS reason
            FROM documents
            WHERE doc_id % 23 = 0 OR doc_id % 29 = 0 OR doc_id % 31 = 0
               OR doc_id % 37 = 0"""))

  // ---------------------------------------------------------------- q139
  // JSONL ingest EXECUTED as a stream (the q118/q133 pattern): the same
  // landing as q137/q138 read through JsonlSource.streamParsed over a
  // real file-source stream, fanned into clean + audit parquet sinks.
  // The registered result is the CLEAN sink — hash-gated against the
  // identical oracle as the batch split, so the micro-batch execution
  // path is held to the same bar; the audit sink's reason histogram is
  // spec-asserted (StreamingSpec), the q118 audit-leg contract.
  private val q139 = Q("q139_stream_jsonl",
    (s, dir) => graft.streaming.StreamHarness.jsonlSinkRun(s, dir)._1
      .select(col("doc_id"), col("lang"), col("text")),
    Some(jsonlCleanSql))

  val all: Seq[Q] = Seq(q36, q37, q38, q39, q40, q41, q137, q138, q139)
}
