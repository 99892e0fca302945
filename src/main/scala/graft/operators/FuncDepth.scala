package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Depth extension of the scalar-function surface: the ClickHouse URL-,
  * hash-, and array-function families (the function groups create_db.py's
  * server exposes beside the basic string/math/date set already covered by
  * Analytics `fn_*`).
  *
  *   - URL family (`protocol/domain/path/queryString/extractURLParameter/
  *     topLevelDomain`): Spark's codegen'd `parse_url` — one expression,
  *     no UDF, stays inside whole-stage codegen.
  *   - Hash family (`MD5/SHA256/hex/base64` + the UUIDStringToNum-style
  *     reformat): all built-ins over binary casts.
  *   - Array family (`arraySort/arrayReverseSort/arrayCompact/
  *     arrayDifference/arrayCumSum/arraySlice/arrayFlatten`): higher-order
  *     functions over per-row arrays. HOF lambdas are interpreted, so these
  *     stay on SHORT arrays (a handful of tokens per row — the per-row
  *     shape CH's array functions serve); corpus-scale signature work uses
  *     the explode+groupBy shapes in TextAnalysis/Dedup instead.
  *
  * All array outputs are `array_join`-ed to strings so the oracle compare
  * is cell-exact on both engines.
  */
object FuncDepth extends QueryModule {

  override def queries: Map[String, Q] = Map(
    // URL function family over a deterministically synthesized URL (the
    // events table carries no URL column; both engines build the same
    // string, so extraction is the only thing under test).
    "fn_url" -> ((s, d) => {
      val url = concat(
        lit("https://"), col("event_type"), lit(".example.com/u/"),
        col("user_id").cast("string"), lit("/p?k="),
        get_json_object(col("props"), "$.k"), lit("&t="), col("event_type"))
      Tables.events(s, d)
        .select(col("event_id"), url.as("url"))
        .select(col("event_id"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("qs"),
          parse_url(col("url"), lit("QUERY"), lit("k")).cast("int").as("k"),
          regexp_extract(parse_url(col("url"), lit("HOST")), "\\.([^.]+)$", 1)
            .as("tld"))
        .filter(col("k") > 90)
        .orderBy(col("event_id"))
    }),

    // Hash/encoding family; `uuid_fmt` is the UUID-reformat shape
    // (MD5 digest rendered 8-4-4-4-12) — deterministic, so oracle-exact.
    "fn_hash" -> ((s, d) => {
      val h = md5(col("p_name").cast("binary"))
      Tables.part(s, d)
        .filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          h.alias("h_md5"),
          sha2(col("p_name").cast("binary"), 256).as("h_sha256"),
          lower(hex(col("p_name"))).as("h_hex"),
          base64(col("p_name").cast("binary")).as("h_b64"),
          concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
            substring(h, 13, 4), substring(h, 17, 4), substring(h, 21, 12))
            .as("uuid_fmt"))
        .orderBy(col("p_partkey"))
    }),

    // Array function family. `words` exercises the string-array ops,
    // `nums` (3 derived longs per row) the numeric ones. `compact_w` is
    // consecutive-duplicate removal (arrayCompact), not distinct; `diff_n`
    // keeps CH's leading 0 convention for arrayDifference.
    "fn_array_ops" -> ((s, d) => {
      val w = split(col("p_name"), " ")
      val n = array(col("p_size").cast("long"),
        pmod(col("p_size") * 3, lit(7)).cast("long"),
        pmod(length(col("p_name")), lit(5)).cast("long"))
      Tables.part(s, d)
        .filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"),
          array_join(array_sort(w), ",").as("sorted_w"),
          array_join(reverse(array_sort(w)), ",").as("rsorted_w"),
          array_join(filter(w, (x: Column, i: Column) =>
            when(i === 0, lit(true)).otherwise(x =!= element_at(w, i))), ",")
            .as("compact_w"),
          array_join(slice(w, 2, 2), ",").as("sliced_w"),
          array_join(transform(sequence(lit(1), size(n)), i =>
            aggregate(slice(n, lit(1), i), lit(0L), (a, x) => a + x)
              .cast("string")), ",").as("cumsum_n"),
          array_join(transform(n, (x: Column, i: Column) =>
            when(i === 0, lit(0L)).otherwise(x - element_at(n, i))
              .cast("string")), ",").as("diff_n"),
          array_join(transform(flatten(array(n, array(lit(99L)))),
            (x: Column) => x.cast("string")), ",").as("flat_n"))
        .orderBy(col("p_partkey"))
    }),

    // The CH higher-order array family THROUGH THE DIALECT: lambda-first
    // argument order (arrayMap/Filter/Exists/All/Count/First/FirstIndex)
    // swapped to Spark's array-first builtins plus the rename tier
    // (arraySort/Distinct/Slice/StringConcat), run as pasted CH text —
    // all codegen-adjacent builtins, no UDFs. Booleans cast to INT so
    // the cross-engine render agrees; arrayFirst coalesced to '' (CH's
    // type default — the documented NULL-vs-default stance).
    "fn_array_lambda" -> ((s, d) =>
      graft.sql.GraftSql.chSql(s, d,
        """SELECT doc_id,
          |  arrayCount(t -> t != '', toks) AS n_toks,
          |  arrayStringConcat(
          |    arrayMap(t -> upper(t),
          |      arrayFilter(t -> length(t) >= 6, toks)), '|') AS big_up,
          |  coalesce(arrayFirst(t -> length(t) >= 6, toks), '') AS first_big,
          |  arrayFirstIndex(t -> length(t) >= 6, toks) AS first_big_at,
          |  arrayUniq(toks) AS u,
          |  CAST(arrayExists(t -> t = 'the', toks) AS INT) AS has_the,
          |  CAST(arrayAll(t -> t != '', toks) AS INT) AS all_full,
          |  arrayStringConcat(
          |    arraySlice(arraySort(arrayDistinct(toks)), 2, 3), ',') AS mid3
          |FROM (SELECT doc_id, splitByChar(' ', text) AS toks
          |      FROM documents WHERE doc_id < 200) t
          |ORDER BY doc_id""".stripMargin)),

    // Geo family (`greatCircleDistance`/`geoDistance` + the bounding-box
    // prefilter pattern): coordinates synthesized deterministically from
    // event ids (pure integer arithmetic — both engines derive identical
    // doubles), haversine distance to a fixed point, the cheap box filter
    // FIRST (the pushdown-friendly pattern: the exact trig runs only on
    // surviving rows), then a distance-band rollup. Binary half-up at
    // 1e-3 km absorbs last-ulp libm differences between engines.
    "fn_geo" -> ((s, d) => {
      val lat = ((col("user_id") * 37) % 17000).cast("double") / 100.0 - 85.0
      val lon = ((col("event_id") * 73) % 36000).cast("double") / 100.0 - 180.0
      val lat1 = radians(col("lat"))
      val lat2 = radians(lit(48.8566))
      val dlat = radians(lit(48.8566)) - radians(col("lat"))
      val dlon = radians(lit(2.3522)) - radians(col("lon"))
      val a = pow(sin(dlat / 2), 2) + cos(lat1) * cos(lat2) * pow(sin(dlon / 2), 2)
      val dist = asin(sqrt(a)) * 2 * 6371.0088
      Tables.events(s, d)
        .select(col("event_id"), lat.as("lat"), lon.as("lon"))
        .filter(col("lat").between(-60.0, 70.0))
        .select(col("event_id"), dist.as("dist_km"))
        .groupBy(floor(col("dist_km") / 2000).cast("long").as("band"))
        .agg(count(lit(1)).as("n"),
          (floor(avg(col("dist_km")) * 1e3 + 0.5) / 1e3).as("avg_km"),
          (floor(min(col("dist_km")) * 1e3 + 0.5) / 1e3).as("min_km"),
          (floor(max(col("dist_km")) * 1e3 + 0.5) / 1e3).as("max_km"))
        .orderBy(col("band"))
    }),

    // IP family (`IPv4NumToString`/`IPv4StringToNum`/`isIPAddressInRange`):
    // synthesized IPv4 numbers (Knuth-hash spread over the 32-bit space),
    // rendered dotted-quad with bit ops, PARSED BACK from the string, and
    // classified RFC-1918-private — the render and parse must round-trip
    // exactly (rt == ip on every row, asserted in the result itself).
    "fn_ip" -> ((s, d) => {
      val ip = pmod(col("user_id") * 2654435761L, lit(4294967296L))
      val b = (n: Int) => shiftright(col("ip"), n).bitwiseAND(lit(255L))
      val quad = concat_ws(".", b(24).cast("string"), b(16).cast("string"),
        b(8).cast("string"), b(0).cast("string"))
      val part = (i: Int) =>
        element_at(split(col("ip_str"), "\\."), i).cast("long")
      Tables.events(s, d)
        .filter(col("event_id") < 200)
        .select(col("event_id"), ip.as("ip"))
        .withColumn("ip_str", quad)
        .withColumn("rt", part(1) * 16777216L + part(2) * 65536L +
          part(3) * 256L + part(4))
        .select(col("event_id"), col("ip"), col("ip_str"),
          (col("rt") === col("ip")).as("roundtrip"),
          (b(24) === 10 || (b(24) === 192 && b(16) === 168))
            .as("is_private"))
        .orderBy(col("event_id"))
    }),

    // Conditional family (`if`/`multiIf`/`nullIf`/`ifNull`/`least`/
    // `greatest`): a three-way CASE band over order totals, empty-comment
    // normalization through nullif→coalesce, and two-sided least/greatest.
    // Pure row-local expressions — whole-stage codegen end to end.
    "fn_cond" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") <= 1000)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 200000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("band"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("(open)")).as("status_nz"),
          least(col("o_custkey"), col("o_orderkey")).as("lo"),
          greatest(col("o_custkey"), col("o_orderkey")).as("hi"))
        .orderBy(col("o_orderkey"))),

    // DateTime depth family (`dateDiff`/`addDays`/`toLastDayOfMonth`/
    // `toQuarter`/`toISOWeek`/`toDayOfWeek`/`formatDateTime`): the
    // calendar arithmetic CH exposes beside the basic toYear/toMonth set
    // already in fn_date. All codegen'd date builtins; ISO week + Monday-
    // first day-of-week are pinned to the ISO-8601 definitions both
    // engines share (Spark `weekday()+1` ≡ DuckDB `isodow`).
    "fn_datetime_depth" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate"), to_date(lit("1995-06-15")))
            .cast("int").as("dd"),
          // DATE cells render differently through the two engines'
          // pandas paths (duckdb DATE → datetime64 'd 00:00:00'); the
          // string render is the portable calendar answer
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd")
            .as("plus30"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("ld"),
          quarter(col("o_orderdate")).cast("int").as("q"),
          weekofyear(col("o_orderdate")).cast("int").as("wk"),
          (weekday(col("o_orderdate")) + 1).cast("int").as("idow"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy(col("o_orderkey"))),

    // String-distance family (`editDistance`/`ngramDistance`): Levenshtein
    // against a fixed probe and between the name's own two tokens (both
    // engines ship the same DP definition), plus character-trigram Jaccard
    // similarity built from first principles — distinct 3-grams via
    // transform(sequence), then |∩|/|∪| — the shape ngramDistance
    // computes natively. Row-local; the trigram arrays live only inside
    // one projection, never crossing a shuffle.
    "fn_string_distance" -> ((s, d) => {
      def grams(c: Column) = array_distinct(transform(
        sequence(lit(1), greatest(length(c) - 2, lit(1))),
        i => c.substr(i, lit(3))))
      val g1 = grams(col("p_name"))
      val g2 = grams(lit("red widget"))
      Tables.part(s, d)
        .filter(col("p_partkey") <= 800)
        .select(col("p_partkey"), col("p_name"),
          levenshtein(col("p_name"), lit("red widget")).as("lev_w"),
          levenshtein(split_part(col("p_name"), lit(" "), lit(1)),
            split_part(col("p_name"), lit(" "), lit(2))).as("lev_tok"),
          round(size(array_intersect(g1, g2)).cast("double") /
            size(array_union(g1, g2)), 6).as("jac3"))
        .orderBy(col("p_partkey"))
    }),

    // JSON-extraction depth (`JSONExtractInt/String/ArrayRaw`/
    // `JSONLength`/nested paths/missing-key default — the JSONExtract
    // family beyond fn_json's single get): both engines BUILD the same
    // document from event fields (the fn_url pattern — synthesis is pure
    // arithmetic/concat, so extraction is the only thing under test),
    // then pull typed scalars, an array element, an array length, a
    // nested field, and a missing path's default back out. All codegen'd
    // builtins — no UDF, no shuffle beyond the presentation sort.
    "fn_json_depth" -> ((s, d) => {
      val k = get_json_object(col("props"), "$.k").cast("int")
      val json = concat(
        lit("{\"a\": "), k,
        lit(", \"s\": \""), col("event_type"),
        lit("\", \"arr\": ["), k, lit(","), (k * 2), lit(","), (k * 3),
        lit("], \"nest\": {\"b\": "), pmod(col("user_id"), lit(10)),
        lit("}}"))
      Tables.events(s, d)
        .filter(col("event_id") < 3000)
        .select(col("event_id"), json.as("j"))
        .select(col("event_id"),
          get_json_object(col("j"), "$.a").cast("int").as("a_int"),
          get_json_object(col("j"), "$.s").as("s_str"),
          get_json_object(col("j"), "$.arr[1]").cast("long").as("arr1"),
          json_array_length(get_json_object(col("j"), "$.arr"))
            .cast("int").as("n_arr"),
          get_json_object(col("j"), "$.nest.b").cast("int").as("b"),
          coalesce(get_json_object(col("j"), "$.zzz"), lit("-")).as("missing"))
        .orderBy(col("event_id"))
    }),

    // String-search family (`position`/`countSubstrings`/`multiSearchAny`/
    // `splitByChar`+indexing/`leftPad`): substring position, an occurrence
    // count via the replace-length identity (portable to any engine,
    // stays codegen'd), an any-of-patterns regex hit, the first token of
    // the space-split name, and fixed-width key padding.
    "fn_string_search" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") <= 500)
        .select(col("p_partkey"),
          instr(col("p_name"), "wid").as("pos"),
          ((length(col("p_name")) -
            length(expr("replace(p_name, 'id', '')"))) / 2)
            .cast("long").as("n_id"),
          col("p_name").rlike("widget|gadget").as("any_hit"),
          split(col("p_name"), " ").getItem(0).as("first_tok"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("key8"))
        .orderBy(col("p_partkey"))),

    // numbers()/system.numbers table-function analog: a GENERATED source,
    // no input files at all — spark.range is a parallelized leaf operator
    // (Range splits across executors like ClickHouse's numbers_mt), here
    // folded per residue class. sum(id) at 1e6 rows ≈ 5e11 and
    // sum(id²) ≈ 3.3e17: both inside long range, declared BIGINT on the
    // oracle side too.
    "src_numbers" -> ((s, d) =>
      s.range(0L, 1000000L)
        .groupBy((col("id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("id")).cast("long").as("sum_id"),
          sum(col("id") * col("id")).cast("long").as("sum_sq"))
        .orderBy(col("bucket"))),

    // Encoding family (`hex`/`unhex`/`base64Encode`/`base64Decode`/`bin`):
    // part names encoded both ways, ROUND-TRIPPED back through decode (the
    // rt columns must equal the original on every row — the oracle asserts
    // it by emitting p_name itself), and the integer key rendered binary.
    // ClickHouse map-function family (map / mapKeys / mapContains /
    // mapApply probes) over a per-priority map of order-status counts.
    // The map is BUILT distributively — count per (priority, status),
    // then sort_array(collect_list(struct)) → map_from_entries, so key
    // order is deterministic — and probed/flattened to scalar + string
    // outputs: a map-typed result cell would crash the pandas-based
    // oracle compare exactly like an array (round-6 postmortem).
    "fn_map_ops" -> ((s, d) => {
      val counts = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("prio"))
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("st"), col("cnt"))))).as("m"))
        .select(col("prio"),
          size(col("m")).cast("long").as("n_statuses"),
          array_join(map_keys(col("m")), ",").as("statuses"),
          coalesce(element_at(col("m"), "F"), lit(0L)).as("n_f"),
          coalesce(element_at(col("m"), "O"), lit(0L)).as("n_o"),
          (coalesce(element_at(col("m"), "F"), lit(0L)) +
            coalesce(element_at(col("m"), "P"), lit(0L))).as("n_fp"))
        .orderBy(col("prio"))
    }),

    "fn_encoding" -> ((s, d) => {
      val bytes = encode(col("p_name"), "UTF-8")
      Tables.part(s, d)
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          base64(bytes).as("b64"),
          hex(bytes).as("hx"),
          decode(unbase64(base64(bytes)), "UTF-8").as("rt_b64"),
          decode(unhex(hex(bytes)), "UTF-8").as("rt_hex"),
          bin(col("p_partkey")).as("key_bin"))
        .orderBy(col("p_partkey"))
    }),

    // Nested type + multi-array ARRAY JOIN: CH `Nested(ln, qty)` stores
    // parallel arrays and `ARRAY JOIN ns.ln, ns.qty` explodes them in
    // LOCKSTEP (never a cross product). Same here: per-order parallel
    // arrays built from lineitem, zip-exploded via arrays_zip — the
    // round-trip back to the original rows proves position i of one
    // array stays glued to position i of the other.
    "fn_nested_zip" -> ((s, d) =>
      Tables.lineitem(s, d).filter(col("l_orderkey") < 200)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber"), col("l_quantity")))).as("ns"))
        .select(col("l_orderkey"),
          transform(col("ns"), x => x.getField("l_linenumber")).as("lns"),
          transform(col("ns"), x => x.getField("l_quantity")).as("qtys"))
        .select(col("l_orderkey"),
          explode(arrays_zip(col("lns"), col("qtys"))).as("z"))
        .select(col("l_orderkey"),
          col("z.lns").as("ln"), col("z.qtys").as("qty"))
        .orderBy(col("l_orderkey"), col("ln"))),
  )

  override def oracleSql: Map[String, String] = Map(
    "fn_cond" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 200000 THEN 'high'
        |      WHEN o_totalprice > 100000 THEN 'mid'
        |      ELSE 'low' END AS band,
        | coalesce(nullif(o_orderstatus, 'O'), '(open)') AS status_nz,
        | least(o_custkey, o_orderkey) AS lo,
        | greatest(o_custkey, o_orderkey) AS hi
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin,

    "fn_datetime_depth" ->
      """SELECT o_orderkey,
        | CAST(date_diff('day', DATE '1995-06-15', o_orderdate) AS INT) AS dd,
        | strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        | strftime(last_day(o_orderdate), '%Y-%m-%d') AS ld,
        | CAST(quarter(o_orderdate) AS INT) AS q,
        | CAST(weekofyear(o_orderdate) AS INT) AS wk,
        | CAST(isodow(o_orderdate) AS INT) AS idow,
        | strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,

    "fn_string_distance" ->
      """WITH g AS (
        |  SELECT p_partkey, p_name,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(p_name) - 2, 1)),
        |      i -> substr(p_name, i, 3))) AS g1,
        |    list_distinct(list_transform(generate_series(1, 8),
        |      i -> substr('red widget', i, 3))) AS g2
        |  FROM part WHERE p_partkey <= 800)
        |SELECT p_partkey, p_name,
        |  CAST(levenshtein(p_name, 'red widget') AS INT) AS lev_w,
        |  CAST(levenshtein(split_part(p_name, ' ', 1),
        |                   split_part(p_name, ' ', 2)) AS INT) AS lev_tok,
        |  round(CAST(len(list_intersect(g1, g2)) AS DOUBLE) /
        |        len(list_distinct(list_concat(g1, g2))), 6) AS jac3
        |FROM g ORDER BY p_partkey""".stripMargin,

    "fn_json_depth" ->
      """WITH e AS (
        |  SELECT event_id,
        |    '{"a": ' || CAST(json_extract(props, '$.k') AS INT) ||
        |    ', "s": "' || event_type ||
        |    '", "arr": [' || CAST(json_extract(props, '$.k') AS INT) ||
        |    ',' || CAST(json_extract(props, '$.k') AS INT) * 2 ||
        |    ',' || CAST(json_extract(props, '$.k') AS INT) * 3 ||
        |    '], "nest": {"b": ' || (user_id % 10) || '}}' AS j
        |  FROM events WHERE event_id < 3000)
        |SELECT event_id,
        | CAST(json_extract(j, '$.a') AS INT) AS a_int,
        | json_extract_string(j, '$.s') AS s_str,
        | CAST(json_extract(j, '$.arr[1]') AS BIGINT) AS arr1,
        | CAST(json_array_length(j, '$.arr') AS INT) AS n_arr,
        | CAST(json_extract(j, '$.nest.b') AS INT) AS b,
        | coalesce(json_extract_string(j, '$.zzz'), '-') AS missing
        |FROM e ORDER BY event_id""".stripMargin,

    "fn_string_search" ->
      """SELECT p_partkey,
        | strpos(p_name, 'wid') AS pos,
        | ((length(p_name) - length(replace(p_name, 'id', ''))) / 2)::BIGINT AS n_id,
        | regexp_matches(p_name, 'widget|gadget') AS any_hit,
        | split_part(p_name, ' ', 1) AS first_tok,
        | lpad(p_partkey::VARCHAR, 8, '0') AS key8
        |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin,

    "src_numbers" ->
      """SELECT id % 10 AS bucket, count(*) AS n,
        | sum(id)::BIGINT AS sum_id, sum(id * id)::BIGINT AS sum_sq
        |FROM range(0, 1000000) t(id)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    // no maps needed on the oracle side: the probes restate as
    // conditional sums over the same (priority, status) counts
    "fn_map_ops" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS prio, o_orderstatus AS st,
        |         count(*) AS cnt
        |  FROM orders GROUP BY 1, 2)
        |SELECT prio,
        |  count(*) AS n_statuses,
        |  string_agg(st, ',' ORDER BY st) AS statuses,
        |  sum(CASE WHEN st = 'F' THEN cnt ELSE 0 END)::BIGINT AS n_f,
        |  sum(CASE WHEN st = 'O' THEN cnt ELSE 0 END)::BIGINT AS n_o,
        |  sum(CASE WHEN st IN ('F', 'P') THEN cnt ELSE 0 END)::BIGINT AS n_fp
        |FROM c GROUP BY prio ORDER BY prio""".stripMargin,

    // the zip-explode round-trips to the original rows
    "fn_nested_zip" ->
      """SELECT l_orderkey, l_linenumber AS ln, l_quantity AS qty
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, ln""".stripMargin,

    "fn_encoding" ->
      """SELECT p_partkey,
        | to_base64(encode(p_name)) AS b64,
        | hex(encode(p_name)) AS hx,
        | p_name AS rt_b64,
        | p_name AS rt_hex,
        | bin(p_partkey) AS key_bin
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,
    "fn_url" ->
      """SELECT event_id,
        |  regexp_extract(url, '^([a-z]+)://', 1)            AS proto,
        |  regexp_extract(url, '^[a-z]+://([^/]+)', 1)       AS host,
        |  regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1)               AS qs,
        |  CAST(regexp_extract(url, '[?&]k=([^&#]*)', 1) AS INTEGER) AS k,
        |  regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
        |                 '\.([^.]+)$', 1)                   AS tld
        |FROM (
        |  SELECT event_id,
        |    'https://' || event_type || '.example.com/u/' || user_id ||
        |    '/p?k=' || json_extract_string(props, '$.k') ||
        |    '&t=' || event_type AS url
        |  FROM events)
        |WHERE CAST(regexp_extract(url, '[?&]k=([^&#]*)', 1) AS INTEGER) > 90
        |ORDER BY event_id""".stripMargin,

    "fn_hash" ->
      """SELECT p_partkey,
        |  md5(p_name)                       AS h_md5,
        |  sha256(p_name)                    AS h_sha256,
        |  lower(hex(p_name))                AS h_hex,
        |  to_base64(encode(p_name))         AS h_b64,
        |  substr(md5(p_name), 1, 8)  || '-' ||
        |  substr(md5(p_name), 9, 4)  || '-' ||
        |  substr(md5(p_name), 13, 4) || '-' ||
        |  substr(md5(p_name), 17, 4) || '-' ||
        |  substr(md5(p_name), 21, 12)       AS uuid_fmt
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey""".stripMargin,

    "fn_array_ops" ->
      """SELECT p_partkey,
        |  array_to_string(list_sort(w), ',')         AS sorted_w,
        |  array_to_string(list_reverse_sort(w), ',') AS rsorted_w,
        |  array_to_string([w[i] FOR i IN generate_series(1, len(w))
        |                   IF i = 1 OR w[i] != w[i-1]], ',') AS compact_w,
        |  array_to_string(w[2:3], ',')               AS sliced_w,
        |  array_to_string(list_transform(generate_series(1, len(n)),
        |    i -> CAST(list_sum(n[1:i]) AS BIGINT)), ',')     AS cumsum_n,
        |  array_to_string(list_transform(generate_series(1, len(n)),
        |    i -> CASE WHEN i = 1 THEN 0 ELSE n[i] - n[i-1] END), ',')
        |                                             AS diff_n,
        |  array_to_string(flatten([n, [99]]), ',')   AS flat_n
        |FROM (
        |  SELECT p_partkey, string_split(p_name, ' ') AS w,
        |    [CAST(p_size AS BIGINT), (p_size*3) % 7, length(p_name) % 5] AS n
        |  FROM part WHERE p_name LIKE '%widget%')
        |ORDER BY p_partkey""".stripMargin,

    // DuckDB's list lambdas restate each rewrite natively; list slicing
    // [2:4] = 1-based inclusive bounds = slice(arr, 2, 3). big_up/mid3
    // coalesced: DuckDB's array_to_string of an EMPTY list yields NULL
    // where Spark's array_join yields ''
    "fn_array_lambda" ->
      """SELECT doc_id,
        |  len(list_filter(toks, t -> t != '')) AS n_toks,
        |  coalesce(array_to_string(list_transform(
        |    list_filter(toks, t -> len(t) >= 6), t -> upper(t)), '|'), '')
        |    AS big_up,
        |  coalesce(list_filter(toks, t -> len(t) >= 6)[1], '') AS first_big,
        |  coalesce(list_position(
        |    list_transform(toks, t -> len(t) >= 6), true), 0) AS first_big_at,
        |  len(list_distinct(toks)) AS u,
        |  CASE WHEN len(list_filter(toks, t -> t = 'the')) > 0
        |       THEN 1 ELSE 0 END AS has_the,
        |  CASE WHEN len(list_filter(toks, t -> t = '')) = 0
        |       THEN 1 ELSE 0 END AS all_full,
        |  coalesce(array_to_string(
        |    list_sort(list_distinct(toks))[2:4], ','), '') AS mid3
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents WHERE doc_id < 200) t
        |ORDER BY doc_id""".stripMargin,

    "fn_geo" ->
      """SELECT CAST(floor(dist_km / 2000) AS BIGINT) AS band,
        |  count(*) AS n,
        |  floor(avg(dist_km) * 1e3 + 0.5) / 1e3 AS avg_km,
        |  floor(min(dist_km) * 1e3 + 0.5) / 1e3 AS min_km,
        |  floor(max(dist_km) * 1e3 + 0.5) / 1e3 AS max_km
        |FROM (
        |  SELECT event_id,
        |    asin(sqrt(
        |      pow(sin((radians(48.8566) - radians(lat)) / 2), 2) +
        |      cos(radians(lat)) * cos(radians(48.8566)) *
        |      pow(sin((radians(2.3522) - radians(lon)) / 2), 2)))
        |      * 2 * 6371.0088 AS dist_km
        |  FROM (
        |    SELECT event_id,
        |      ((user_id * 37) % 17000) / 100.0 - 85.0 AS lat,
        |      ((event_id * 73) % 36000) / 100.0 - 180.0 AS lon
        |    FROM events)
        |  WHERE lat BETWEEN -60.0 AND 70.0)
        |GROUP BY band ORDER BY band""".stripMargin,

    "fn_ip" ->
      """SELECT event_id, ip,
        |  (ip >> 24 & 255) || '.' || (ip >> 16 & 255) || '.' ||
        |  (ip >> 8 & 255)  || '.' || (ip & 255) AS ip_str,
        |  CAST(string_split((ip >> 24 & 255) || '.' || (ip >> 16 & 255)
        |         || '.' || (ip >> 8 & 255) || '.' || (ip & 255), '.')[1]
        |       AS BIGINT) * 16777216 +
        |  CAST(string_split((ip >> 24 & 255) || '.' || (ip >> 16 & 255)
        |         || '.' || (ip >> 8 & 255) || '.' || (ip & 255), '.')[2]
        |       AS BIGINT) * 65536 +
        |  CAST(string_split((ip >> 24 & 255) || '.' || (ip >> 16 & 255)
        |         || '.' || (ip >> 8 & 255) || '.' || (ip & 255), '.')[3]
        |       AS BIGINT) * 256 +
        |  CAST(string_split((ip >> 24 & 255) || '.' || (ip >> 16 & 255)
        |         || '.' || (ip >> 8 & 255) || '.' || (ip & 255), '.')[4]
        |       AS BIGINT) = ip AS roundtrip,
        |  (ip >> 24 & 255) = 10 OR
        |  ((ip >> 24 & 255) = 192 AND (ip >> 16 & 255) = 168) AS is_private
        |FROM (
        |  SELECT event_id, (user_id * 2654435761) % 4294967296 AS ip
        |  FROM events WHERE event_id < 200)
        |ORDER BY event_id""".stripMargin,
  )
}
