package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.multimodal.Multimodal
import graft.streaming.Streams

/** Text analysis (lang-ID, quality scoring, token counting), streaming
  * equivalence, and multimodal plumbing queries.
  */
object QualityQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  def all: Seq[Q] = Seq(

    // ---- Language-ID heuristic (stopword hits + CJK ratio, fixed
    // tie-break). The oracle mirrors the expression exactly. ----
    Q("q37_lang_id",
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang").as("labeled"),
            TextFns.langId(col("text")).as("predicted"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH x AS (
             |  SELECT doc_id, lang AS labeled,
             |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |      w -> w IN ('the','and','of','to','in','is','that','it','for','with'))) AS h_en,
             |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |      w -> w IN ('le','la','les','de','et','un','une','est','dans','pour'))) AS h_fr,
             |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |      w -> w IN ('el','la','los','de','y','un','una','es','en','para'))) AS h_es,
             |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |      w -> w IN ('der','die','das','und','ein','eine','ist','in','zu','mit'))) AS h_de,
             |    CASE WHEN length(text) > 0 THEN
             |      length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g')) * 20
             |        / greatest(length(text), 1)
             |    ELSE 0 END AS h_zh
             |  FROM documents),
             |y AS (SELECT doc_id, labeled, h_en, h_fr, h_es, h_de, h_zh,
             |        greatest(h_en, greatest(h_fr, greatest(h_es, greatest(h_de, h_zh)))) AS best
             |      FROM x)
             |SELECT doc_id, labeled,
             |  CASE WHEN h_en = best AND best > 0 THEN 'en'
             |       WHEN h_fr = best AND best > 0 THEN 'fr'
             |       WHEN h_es = best AND best > 0 THEN 'es'
             |       WHEN h_de = best AND best > 0 THEN 'de'
             |       WHEN h_zh = best AND best > 0 THEN 'zh'
             |       ELSE 'unknown' END AS predicted
             |FROM y ORDER BY doc_id""".stripMargin)),

    // ---- Composite text-quality score (length band + stopword ratio +
    // punctuation sanity). ----
    Q("q38_text_quality",
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("doc_id"), round(TextFns.textQuality(col("text")), 4).as("q"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH x AS (
             |  SELECT doc_id,
             |    len(string_split_regex(trim(text), '\s+')) AS n,
             |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      w -> w IN ('the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by'))) AS DOUBLE)
             |      / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS sw,
             |    CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE)
             |      / CAST(length(text) AS DOUBLE) AS pr
             |  FROM documents WHERE length(trim(text)) > 0)
             |SELECT doc_id, round(
             |  (CASE WHEN n BETWEEN 50 AND 10000 THEN 0.4::DOUBLE
             |        WHEN n BETWEEN 10 AND 50000 THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END
             |   + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 0.3::DOUBLE
             |          WHEN sw > 0.0 THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END
             |   + CASE WHEN pr < 0.2 THEN 0.3::DOUBLE
             |          WHEN pr < 0.4 THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END), 4) AS q
             |FROM x ORDER BY doc_id""".stripMargin)),

    // ---- Token counting: whitespace + BPE-ish regex pre-tokenizer. ----
    Q("q39_token_counts",
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextFns.wordCount(col("text")).cast("long").as("ws_tokens"),
            TextFns.tokenCountBpe(col("text")).cast("long").as("bpe_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- §2.12 streaming: watermarked tumbling windows via a real
    // Structured Streaming run (Trigger.AvailableNow), result returned as a
    // batch DF. Equality with the batch q21 aggregation (modulo trailing
    // windows held by the watermark) is asserted in StreamingSpec — and the
    // oracle below makes it official: AvailableNow drains all input, so the
    // emitted set is exactly the batch agg restricted to windows whose END
    // has passed the final watermark (max event-time ms - 2h). The trailing
    // held-back windows are the watermark's correct behavior, not noise;
    // the horizon is derived from the data, so the oracle is deterministic
    // at every sf. ----
    Q("q80_stream_tumbling",
      (s, dir) => {
        Streams.runAvailableNowMem(
            Streams.tumblingCounts(Streams.eventsStream(s, dir)), "q80")
          .orderBy(col("h"), col("event_type"))
      },
      Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
             |m AS (SELECT epoch_ms(max(ts)) AS mxms FROM e),
             |agg AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
             |          count(*) AS n, round(sum(value), 4) AS sv
             |        FROM e GROUP BY 1, 2)
             |SELECT h, event_type, n, sv FROM agg, m
             |WHERE epoch_ms(h + INTERVAL 1 HOUR) <= mxms - 7200000
             |ORDER BY h, event_type""".stripMargin)),

    // ---- §2.12 streaming session windows via a real streaming run.
    // Oracle: gaps-and-islands sessionization (the q23-proven equivalence)
    // restricted to sessions CLOSED by the final watermark — a session
    // window's end is last-event + gap, and append mode emits it once the
    // watermark (max event-time ms - 2h) passes that end. ----
    Q("q83_stream_sessions",
      (s, dir) => {
        Streams.runAvailableNowMem(
            Streams.sessionCounts(Streams.eventsStream(s, dir)), "q83")
          .orderBy(col("user_id"), col("sess_start"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
             |m AS (SELECT epoch_ms(max(ts)) AS mxms FROM e),
             |g AS (SELECT user_id, ts, event_id,
             |        CASE WHEN lag(ts) OVER w IS NULL
             |               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT user_id, ts,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS UNBOUNDED PRECEDING) AS sessno
             |      FROM g),
             |agg AS (SELECT user_id, min(ts) AS sess_start, max(ts) AS sess_end,
             |          count(*) AS n
             |        FROM s GROUP BY user_id, sessno)
             |SELECT sess_start, user_id, n FROM agg, m
             |WHERE epoch_ms(sess_end + INTERVAL 30 MINUTE) <= mxms - 7200000
             |ORDER BY user_id, sess_start""".stripMargin)),

    // ---- §2.12 custom state on Spark 4's transformWithState: the TWS
    // sessionizer (named ValueState + event-time timers) through a real
    // streaming run on the RocksDB store TWS requires. Sessions still open
    // at end-of-input stay held (their timers are beyond the final
    // watermark), matching AvailableNow semantics. ----
    Q("q95_tws_sessions",
      (s, dir) => {
        val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          Streams.runAvailableNowMem(
              graft.streaming.TwsSessions.sessionize(
                Streams.eventsStream(s, dir).withWatermark("ts", "2 hours"),
                gapMinutes = 30).toDF(),
              "q95")
            .orderBy(col("user_id"), col("sess"))
        } finally {
          prev match {
            case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
            case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
          }
        }
      },
      // Oracle mirrors the processor's TWO emission paths exactly: a session
      // closed by a later event emits INLINE (watermark-independent; with
      // AvailableNow's single batch that is every session but each user's
      // last), and each user's final open session emits only if its timer
      // (last-event ms + gap) fired under the final watermark. All arithmetic
      // is at MILLISECOND precision — the processor works on ts.getTime, so a
      // us-precision replay would mis-segment sub-ms boundary gaps; `sess` is
      // floor-to-ms micros for the same reason.
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
             |m AS (SELECT epoch_ms(max(ts)) AS mxms FROM e),
             |g AS (SELECT user_id, ts, event_id,
             |        CASE WHEN lag(ts) OVER w IS NULL
             |               OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT user_id, ts, event_id,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS UNBOUNDED PRECEDING) AS sessno
             |      FROM g),
             |agg AS (SELECT user_id, sessno, epoch_ms(min(ts)) * 1000 AS sess,
             |          epoch_ms(max(ts)) AS end_ms, CAST(count(*) AS BIGINT) AS n,
             |          min(event_id) AS first_ev, max(event_id) AS last_ev
             |        FROM s GROUP BY user_id, sessno),
             |lastsess AS (SELECT user_id, max(sessno) AS msess FROM agg GROUP BY user_id)
             |SELECT user_id, sess, n, first_ev, last_ev
             |FROM agg JOIN lastsess USING (user_id), m
             |WHERE sessno < msess OR end_ms + 1800000 <= mxms - 7200000
             |ORDER BY user_id, sess""".stripMargin)),

    // ---- §2.12 sliding windows (1h window, 30m slide) through a real
    // streaming run; each event lands in two overlapping windows. ----
    Q("q84_stream_sliding",
      (s, dir) => {
        val agg = Streams.eventsStream(s, dir)
          .withWatermark("ts", "2 hours")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("ws"), col("event_type"), col("n"))
        Streams.runAvailableNowMem(agg, "q84")
          .orderBy(col("ws"), col("event_type"))
      },
      // Oracle: each event belongs to the two 1h windows starting at its
      // 30-min floor and 30 min before it (us-exact arithmetic, matching
      // Spark's epoch-aligned window()); emitted = windows whose end passed
      // the final watermark, same horizon rule as q80.
      Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
             |m AS (SELECT epoch_ms(max(ts)) AS mxms FROM e),
             |w AS (SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 1800000000) AS t30,
             |             event_type FROM e),
             |x AS (SELECT t30 AS ws, event_type FROM w
             |      UNION ALL
             |      SELECT t30 - INTERVAL 30 MINUTE AS ws, event_type FROM w),
             |agg AS (SELECT ws, event_type, count(*) AS n FROM x GROUP BY 1, 2)
             |SELECT ws, event_type, n FROM agg, m
             |WHERE epoch_ms(ws + INTERVAL 1 HOUR) <= mxms - 7200000
             |ORDER BY ws, event_type""".stripMargin)),

    // ---- §2.12 stateful dedup within the watermark through a real
    // streaming run (event_id is unique in the data, so the invariant is
    // output count == input count; the operator still maintains real
    // dedup state bounded by the watermark). ----
    Q("q85_stream_dedup",
      (s, dir) => {
        val deduped = Streams.dedupWithinWatermark(Streams.eventsStream(s, dir))
          .select(col("event_id"), col("user_id"), col("event_type"))
        Streams.runAvailableNowMem(deduped, "q85")
          .orderBy(col("event_id"))
      },
      // Oracle: dedup rows emit immediately on first sight (append mode holds
      // back nothing — the watermark only bounds the dedup STATE), and
      // event_id is unique in this data, so the emitted set is the input.
      Some("""SELECT event_id, user_id, event_type FROM events
             |ORDER BY event_id""".stripMargin)),

    // ---- §2.12 stream-stream join through a real streaming run:
    // click -> purchase attribution within 30 min per user; the time-bound
    // condition keeps both sides' state evictable. Equality with the batch
    // formulation is asserted in StreamingSpec. ----
    Q("q87_stream_join",
      (s, dir) => {
        val ev = Streams.eventsStream(s, dir)
        Streams.runAvailableNowMem(
            Streams.attributionJoin(
              ev.filter(col("event_type") === "click"),
              Streams.eventsStream(s, dir).filter(col("event_type") === "purchase"),
              withinMinutes = 30), "q87")
          .select(col("user_id"), col("click_id"), col("purchase_id"))
          .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
      },
      // Oracle: the batch time-bounded join IS the emitted set — a streaming
      // inner join emits every match once both sides have arrived, and
      // AvailableNow drains both sides completely (the watermark evicts
      // state, it never suppresses an inner-join match).
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |             CAST(ts AS TIMESTAMP) AS ts FROM events),
             |c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
             |      FROM e WHERE event_type = 'click'),
             |p AS (SELECT user_id AS pu, ts AS purchase_ts, event_id AS purchase_id
             |      FROM e WHERE event_type = 'purchase')
             |SELECT user_id, click_id, purchase_id
             |FROM c JOIN p ON user_id = pu
             |  AND purchase_ts >= click_ts
             |  AND purchase_ts < click_ts + INTERVAL 30 MINUTE
             |ORDER BY user_id, click_id, purchase_id""".stripMargin)),

    // ---- Multimodal plumbing on the REAL JDK image codec: per-doc
    // deterministic PNG payloads -> ImageIO decode -> real 64x64 resample ->
    // luminance-histogram features. rows-only by nature (DuckDB cannot
    // decode PNG); the codec behavior itself is pinned in JdkCodecsSpec. ----
    Q("q81_multimodal_features",
      (s, dir) => {
        val codec = new graft.multimodal.JdkCodecs.ImageIoCodec
        val fixture = graft.multimodal.JdkCodecs.pngFixtureFromDocuments(
          t(s, dir, "documents"))
        val decoded = Multimodal.decode(fixture, codec)
        val resized = Multimodal.resize(decoded, codec, w = 64, h = 64)
        Multimodal.extractFeatures(resized, codec, dim = 16)
          .select(col("doc_id"), col("format"),
            col("meta.width").as("width"), col("meta.height").as("height"),
            length(col("content")).as("n_bytes"),
            round(element_at(col("features"), 1), 4).as("f0"))
          .orderBy(col("doc_id"))
      },
      None),

    // ---- Perceptual-hash image dedup: the multimodal wing meets the
    // dedup story. Planted near-duplicate PNGs (groups of ten share a
    // base image, each member perturbs a few pixels) -> DCT pHash in the
    // executors -> the SimHash 16-bit-block Hamming pairing. The hash
    // itself is JVM-deterministic (StrictMath DCT) but not SQL-portable,
    // so the generated oracle inlines the hashes and replays blocking +
    // integer Hamming exactly — the q51 split of "algorithm pinned by
    // spec, pairing hash-proven" applied to images. ----
    Q("q142_phash_dedup",
      (s, dir) => {
        val fixture = graft.multimodal.JdkCodecs.pngNearDupFixture(
          t(s, dir, "documents"))
        val hashes = graft.multimodal.JdkCodecs.pHashes(
          fixture, "doc_id", "content")
        graft.operators.Dedup.hammingPairs(hashes, "doc_id", "phash",
            maxHamming = 3)
          .select(col("id_a"), col("id_b"),
            col("hamming").cast("long").as("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      None,
      oracleGen = Some(q142OracleGen _)),

    // ---- Multimodal frame sampling (every 2nd 64-byte "frame"). ----
    Q("q82_frame_sample",
      (s, dir) => {
        val fixture = Multimodal.fixtureFromDocuments(t(s, dir, "documents"))
        Multimodal.sampleFrames(fixture, frameBytes = 64, stride = 2)
          .select(col("doc_id"), col("frame_id"),
            md5(col("frame")).as("frame_hash"))
          .orderBy(col("doc_id"), col("frame_id"))
      },
      // Oracle: the fixture's binary IS the document text's bytes, and this
      // corpus is pure ASCII (verified: octet_length(encode(text)) ==
      // length(text) for every row at every sf), so DuckDB's VARCHAR
      // substring slices the same bytes the Spark binary substr does and
      // md5(VARCHAR) hashes them identically.
      Some("""WITH n AS (SELECT doc_id, text AS content,
             |        greatest(CAST(ceil(length(text) / 64.0) AS INT) - 1, 0) AS maxf
             |      FROM documents),
             |x AS (SELECT doc_id, content, unnest(generate_series(0, maxf)) AS frame_id
             |      FROM n)
             |SELECT doc_id, CAST(frame_id AS INTEGER) AS frame_id,
             |  md5(substring(content, CAST(frame_id * 64 + 1 AS INT), 64)) AS frame_hash
             |FROM x WHERE frame_id % 2 = 0
             |ORDER BY doc_id, frame_id""".stripMargin)),

    // ---- Multimodal audio segmentation: 500ms windows, 100ms overlap at a
    // 16 kB/s PCM-ish rate (coverage/overlap invariants pinned in the
    // spec; byte-slice hashes replayed in DuckDB — the fixture corpus is
    // pure ASCII, so VARCHAR slicing equals byte slicing, see q82). ----
    Q("q86_audio_segments",
      (s, dir) => {
        val fixture = Multimodal.fixtureFromDocuments(t(s, dir, "documents"))
        Multimodal.segmentAudio(fixture, bytesPerSecond = 16000,
            segmentMs = 500, overlapMs = 100)
          .select(col("doc_id"), col("segment_id"), col("start_ms"),
            length(col("segment")).as("seg_bytes"),
            md5(col("segment")).as("seg_hash"))
          .orderBy(col("doc_id"), col("segment_id"))
      },
      Some("""WITH n AS (SELECT doc_id, text AS content,
             |        CASE WHEN length(text) <= 8000 THEN 1
             |             ELSE CAST(ceil((length(text) - 8000) / 6400.0) AS INT) + 1
             |        END AS nseg
             |      FROM documents),
             |x AS (SELECT doc_id, content, unnest(generate_series(0, nseg - 1)) AS segment_id
             |      FROM n)
             |SELECT doc_id, CAST(segment_id AS INTEGER) AS segment_id,
             |  CAST(segment_id * 400 AS BIGINT) AS start_ms,
             |  CAST(length(substring(content, CAST(segment_id * 6400 + 1 AS INT), 8000)) AS INT) AS seg_bytes,
             |  md5(substring(content, CAST(segment_id * 6400 + 1 AS INT), 8000)) AS seg_hash
             |FROM x ORDER BY doc_id, segment_id""".stripMargin)),

    // ---- Streaming Count-Min: per-microbatch sketch shards written
    // idempotently by batch id, merged on read. AvailableNow drains the
    // whole source, so the merged streaming sketch MUST equal a batch CMS
    // over the events table — which the oracle computes directly (same
    // portable md5 hash family as q107). event_type values are single
    // tokens, so tokenize(lower(text)) == lower(event_type). ----
    Q("q108_stream_countmin",
      (s, dir) => {
        import graft.operators.Sketches
        val tmp = java.nio.file.Files.createTempDirectory("graft_q108_").toString
        Sketches.streamingCountMin(
          Streams.eventsStream(s, dir).select(col("event_type").as("text")),
          "text", s"$tmp/sk", s"$tmp/ckpt", depth = 4, width = 64)
        val terms = Tables(s, dir, "events")
          .select(lower(col("event_type")).as("term")).distinct()
        Sketches.estimate(Sketches.readMerged(s, s"$tmp/sk"), terms, "term",
            depth = 4, width = 64)
          .orderBy(col("term"))
      },
      Some("""WITH tok AS (SELECT lower(event_type) AS t FROM events),
             |r AS (SELECT unnest(range(4)) AS row),
             |sk AS (SELECT r.row,
             |         CAST(concat('0x', substr(md5(concat(r.row, ':', t)), 1, 8)) AS BIGINT)
             |           % 64 AS bucket,
             |         CAST(count(*) AS BIGINT) AS w
             |       FROM tok, r GROUP BY 1, 2),
             |terms AS (SELECT DISTINCT lower(event_type) AS term FROM events),
             |q AS (SELECT terms.term, r.row,
             |        CAST(concat('0x', substr(md5(concat(r.row, ':', term)), 1, 8)) AS BIGINT)
             |          % 64 AS bucket
             |      FROM terms, r)
             |SELECT term, CAST(min(coalesce(w, 0)) AS BIGINT) AS est
             |FROM q LEFT JOIN sk ON sk.row = q.row AND sk.bucket = q.bucket
             |GROUP BY term ORDER BY term""".stripMargin)),

    // ---- Streaming HyperLogLog: per-microbatch register shards written
    // idempotently by batch id (the q108 _SUCCESS discipline), folded on
    // read by max-per-bucket — the HLL merge law — so the drained
    // stream's distinct-user estimate per event_type MUST equal the
    // batch HLL over the events table, which the oracle computes
    // directly (the q150 integer-space replay, value = user_id). The
    // register store is groups x 64 rows per batch regardless of batch
    // size: distinct-counting 100 TB of events costs one bounded-output
    // scan per increment and a register fold on read. ----
    Q("q153_stream_hll",
      (s, dir) => {
        import graft.operators.Sketches
        val tmp = java.nio.file.Files.createTempDirectory("graft_q153_").toString
        Sketches.streamingHll(
          Streams.eventsStream(s, dir)
            .select(col("event_type"), col("user_id")),
          "user_id", Seq("event_type"), s"$tmp/hll", s"$tmp/ckpt", m = 64)
        val regs = Sketches.readMergedHll(s, s"$tmp/hll", Seq("event_type"))
        Sketches.hllEstimate(regs, Seq("event_type"), m = 64)
          .join(Tables(s, dir, "events").groupBy(col("event_type"))
            .agg(countDistinct(col("user_id")).as("true_nd")), Seq("event_type"))
          .select(col("event_type"), col("true_nd"), col("raw_est"),
            col("v_empty"), col("est"))
          .orderBy(col("event_type"))
      },
      Some("""WITH h AS (SELECT event_type, user_id,
             |        CAST(concat('0x', substr(md5(concat('b:', user_id)), 1, 8))
             |          AS BIGINT) % 64 AS bucket,
             |        CAST(concat('0x', substr(md5(concat('r:', user_id)), 1, 15))
             |          AS BIGINT) AS hr
             |      FROM events),
             |reg AS (SELECT event_type, bucket,
             |          max(least(CAST(bit_count((hr & -hr) - 1) AS BIGINT) + 1,
             |                    32)) AS r
             |        FROM h GROUP BY 1, 2),
             |z AS (SELECT event_type,
             |        CAST(sum(CAST(1 AS BIGINT) << CAST(32 - r AS INT))
             |          AS BIGINT)
             |          + (64 - count(*)) * 4294967296 AS z_scaled,
             |        64 - count(*) AS v_empty
             |      FROM reg GROUP BY 1),
             |e AS (SELECT event_type, v_empty,
             |        CAST((2904064 * 4294967296) // (1000 * z_scaled)
             |          AS BIGINT) AS raw_est
             |      FROM z),
             |t AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS true_nd
             |      FROM events GROUP BY 1)
             |SELECT t.event_type, t.true_nd, e.raw_est,
             |  CAST(e.v_empty AS BIGINT) AS v_empty,
             |  CAST(CASE WHEN e.raw_est <= 160 AND e.v_empty > 0
             |    THEN round(64 * ln(64.0 / e.v_empty), 0)
             |    ELSE e.raw_est END AS BIGINT) AS est
             |FROM t JOIN e USING (event_type) ORDER BY t.event_type""".stripMargin)),

    // ---- Streaming KMV: per-microbatch bottom-k register shards written
    // idempotently by batch id (the q108/q153 _SUCCESS discipline),
    // folded on read by the KMV merge law (bottom-k of a union = bottom-k
    // of the union of bottom-ks — every global minimum is among its own
    // shard's minima). The drained stream's estimate MUST equal the
    // batch sketch over the events table, which the oracle computes
    // directly (the q158 integer-space replay). Each shard is groups × 64
    // hashes per batch regardless of batch size. ----
    Q("q159_stream_kmv",
      (s, dir) => {
        import graft.operators.Kmv
        val tmp = java.nio.file.Files.createTempDirectory("graft_q159_").toString
        Kmv.streamingKmv(
          Streams.eventsStream(s, dir)
            .select(col("event_type"), col("user_id")),
          "user_id", Seq("event_type"), s"$tmp/kmv", s"$tmp/ckpt", k = 64)
        val regs = Kmv.readMergedKmv(s, s"$tmp/kmv", Seq("event_type"), k = 64)
        Kmv.kmvEstimate(regs, Seq("event_type"), k = 64)
          .join(Tables(s, dir, "events").groupBy(col("event_type"))
            .agg(countDistinct(col("user_id")).as("true_nd")), Seq("event_type"))
          .select(col("event_type"), col("true_nd"), col("n_seen"),
            col("kth"), col("est"))
          .orderBy(col("event_type"))
      },
      Some("""WITH h AS (SELECT DISTINCT event_type,
             |        CAST(concat('0x', substr(md5(concat('k:', user_id)), 1, 12))
             |          AS BIGINT) AS h
             |      FROM events),
             |r AS (SELECT event_type, h,
             |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             |        count(*) OVER (PARTITION BY event_type) AS nd
             |      FROM h),
             |k AS (SELECT event_type,
             |        CAST(least(max(nd), 64) AS BIGINT) AS n_seen,
             |        max(CASE WHEN rn = 64 THEN h END) AS kth
             |      FROM r WHERE rn <= 64 GROUP BY event_type),
             |t AS (SELECT event_type,
             |        CAST(count(DISTINCT user_id) AS BIGINT) AS true_nd
             |      FROM events GROUP BY 1)
             |SELECT t.event_type, t.true_nd, k.n_seen,
             |  CAST(k.kth AS BIGINT) AS kth,
             |  CAST(CASE WHEN k.n_seen < 64 THEN k.n_seen
             |    ELSE (63 * 281474976710656) // (k.kth + 1) END AS BIGINT) AS est
             |FROM t JOIN k USING (event_type) ORDER BY t.event_type""".stripMargin)),

    // ---- Trailing-window cardinality from daily KMV registers
    // (Kmv.kmvTrailing): distinct users per (event_type, day) over the
    // trailing 7 days, computed by merging the 7 daily register arrays
    // (RANGE window over the REGISTER table — partitions × days rows of
    // ≤ 64 longs, corpus-size-independent; the raw corpus is scanned
    // exactly once, by the daily register build). Early days ride the
    // exact below-k regime, saturated windows the estimator — both in
    // one result. true_nd (exact trailing distinct, here cheap at test
    // scale) sits beside the estimate so the oracle pins BOTH the
    // sketch replay and the ground truth. ----
    Q("q161_kmv_sliding",
      (s, dir) => {
        import graft.operators.Kmv
        val ev = Tables(s, dir, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        val regs = Kmv.kmvRegisters(ev, "user_id", Seq("event_type", "day"), k = 64)
        val win = Kmv.kmvTrailing(regs, Seq("event_type"), "day", days = 7, k = 64)
        val est = Kmv.kmvEstimate(win, Seq("event_type", "day"), k = 64)
        val du = ev.distinct()
        val grid = du.select(col("event_type"), col("day")).distinct()
        val truth = du
          .withColumn("off", explode(sequence(lit(0), lit(6))))
          .select(col("event_type"), date_add(col("day"), col("off")).as("day"),
            col("user_id"))
          .join(grid, Seq("event_type", "day"))
          .groupBy(col("event_type"), col("day"))
          .agg(countDistinct(col("user_id")).as("true_nd"))
        est.join(truth, Seq("event_type", "day"))
          .select(col("event_type"), col("day"), col("true_nd"),
            col("n_seen"), col("kth"), col("est"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH du AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
             |        user_id FROM events),
             |grid AS (SELECT DISTINCT event_type, day FROM du),
             |h AS (SELECT DISTINCT event_type, day,
             |        CAST(concat('0x', substr(md5(concat('k:', user_id)), 1, 12))
             |          AS BIGINT) AS h
             |      FROM du),
             |wd AS (SELECT DISTINCT g.event_type, g.day, h.h
             |       FROM grid g JOIN h ON h.event_type = g.event_type
             |         AND h.day BETWEEN g.day - 6 AND g.day),
             |r AS (SELECT event_type, day, h,
             |        row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rn,
             |        count(*) OVER (PARTITION BY event_type, day) AS nd
             |      FROM wd),
             |k AS (SELECT event_type, day,
             |        CAST(least(max(nd), 64) AS BIGINT) AS n_seen,
             |        max(CASE WHEN rn = 64 THEN h END) AS kth
             |      FROM r WHERE rn <= 64 GROUP BY event_type, day),
             |t AS (SELECT g.event_type, g.day,
             |        CAST(count(DISTINCT du.user_id) AS BIGINT) AS true_nd
             |      FROM grid g JOIN du ON du.event_type = g.event_type
             |        AND du.day BETWEEN g.day - 6 AND g.day
             |      GROUP BY 1, 2)
             |SELECT t.event_type, t.day, t.true_nd, k.n_seen,
             |  CAST(k.kth AS BIGINT) AS kth,
             |  CAST(CASE WHEN k.n_seen < 64 THEN k.n_seen
             |    ELSE (63 * 281474976710656) // (k.kth + 1) END AS BIGINT) AS est
             |FROM t JOIN k USING (event_type, day)
             |ORDER BY t.event_type, t.day""".stripMargin)),

    // ---- STREAMING OHLC (Ohlc.streamingCandles): per-microbatch candle
    // shards via the q108/q153 _SUCCESS discipline, folded on read by the
    // candle merge law — open of the earliest open-key wins, close of the
    // latest close-key wins, high/low/volume are max/min/sum. Candles are
    // a mergeable summary exactly like the sketches, so the drained
    // stream's candles EQUAL the q164 batch candles over the same rows —
    // the oracle is q164's SQL verbatim. Per batch the shard is bounded
    // by touched (hour, type) groups, never batch size. ----
    Q("q166_stream_ohlc",
      (s, dir) => {
        import graft.operators.Ohlc
        val tmp = java.nio.file.Files.createTempDirectory("graft_q166_").toString
        Ohlc.streamingCandles(Streams.eventsStream(s, dir),
          s"$tmp/ohlc", s"$tmp/ckpt")
        Ohlc.finish(Ohlc.readMerged(s, s"$tmp/ohlc"))
          .orderBy(col("h"), col("event_type"))
      },
      Some("""WITH e AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             |        event_type, ts, event_id,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events),
             |r AS (SELECT *,
             |        row_number() OVER (PARTITION BY h, event_type
             |          ORDER BY ts, event_id) AS rn_a,
             |        row_number() OVER (PARTITION BY h, event_type
             |          ORDER BY ts DESC, event_id DESC) AS rn_d
             |      FROM e)
             |SELECT h, event_type,
             |  max(CASE WHEN rn_a = 1 THEN c END) AS open,
             |  max(c) AS high, min(c) AS low,
             |  max(CASE WHEN rn_d = 1 THEN c END) AS close,
             |  CAST(count(*) AS BIGINT) AS volume
             |FROM r GROUP BY h, event_type
             |ORDER BY h, event_type""".stripMargin)),

    // ---- STREAMING anomaly detection (StreamingAnomaly): the q169
    // trailing-window detector as a transformWithState processor — state
    // is the last ≤10 cents per user in RocksDB (the batch frame's
    // O(window) bound made explicit), each event judged before it is
    // pushed, identical integer contract. Drained stream EQUALS the
    // batch query: the oracle is q169's SQL verbatim. ----
    Q("q195_stream_anomaly",
      (s, dir) => {
        val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          Streams.runAvailableNowMem(
              graft.streaming.StreamingAnomaly
                .detect(Streams.eventsStream(s, dir)).toDF(),
              "q195")
            .orderBy(col("user_id"), col("event_id"))
        } finally {
          prev match {
            case Some(p) =>
              s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
            case None =>
              s.conf.unset("spark.sql.streaming.stateStore.providerClass")
          }
        }
      },
      Some("""WITH e AS (SELECT user_id, event_id, ts,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events),
             |w AS (SELECT user_id, event_id, c,
             |        CAST(count(*) OVER win AS BIGINT) AS n_trail,
             |        CAST(sum(c) OVER win AS BIGINT) AS s_trail
             |      FROM e WINDOW win AS (PARTITION BY user_id
             |        ORDER BY ts, event_id
             |        ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
             |SELECT user_id, event_id, c, n_trail, s_trail,
             |  CAST(abs(c * n_trail - s_trail) * 10000 // s_trail
             |    AS BIGINT) AS dev_bp
             |FROM w WHERE n_trail >= 5
             |  AND abs(c * n_trail - s_trail) * 10000 // s_trail > 20000
             |ORDER BY user_id, event_id""".stripMargin)),

    // ---- STREAMING exact quantiles (Selection.streamingValueCounts):
    // per-microbatch value-count shards via the _SUCCESS discipline; the
    // count table is the exact-world analog of a sketch — shards fold by
    // plain sum — so the drained stream's p50/p90/p99 EQUAL the batch
    // counting selection over the same rows (oracle = the q170 shape on
    // events cents). Per batch the shard is bounded by the batch's
    // distinct values, never its row count. ----
    Q("q173_stream_quantiles",
      (s, dir) => {
        import graft.operators.Selection
        val tmp = java.nio.file.Files.createTempDirectory("graft_q173_").toString
        Selection.streamingValueCounts(
          Streams.eventsStream(s, dir)
            .select(round(col("value") * 100).cast("long").as("c")),
          "c", s"$tmp/vc", s"$tmp/ckpt")
        Selection.quantilesFromCounts(
          Selection.readMergedCounts(s, s"$tmp/vc"), Seq(50, 90, 99))
          .orderBy(col("pct"))
      },
      Some("""WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
             |        count(*) AS n
             |      FROM events GROUP BY 1),
             |s AS (SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum
             |      FROM c),
             |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
             |q(pct) AS (VALUES (50), (90), (99)),
             |tg AS (SELECT pct, (tot * pct + 99) // 100 AS target
             |       FROM q, tt)
             |SELECT CAST(tg.pct AS INT) AS pct, min(s.v) AS value,
             |  CAST(tg.target AS BIGINT) AS target_rank
             |FROM tg JOIN s ON s.cum >= tg.target
             |GROUP BY tg.pct, tg.target ORDER BY pct""".stripMargin))
  )

  /** q142 oracle GENERATOR: the per-image pHashes (deterministic JVM DCT,
    * computed by the operator's own codec path over the same fixture) are
    * inlined as VALUES; DuckDB then replays the 16-bit-block candidate
    * join and the integer Hamming verify exactly. The shifted key is
    * masked to 16 bits, so arithmetic-vs-logical shift on negative hashes
    * cannot differ between engines.
    */
  private def q142OracleGen(s: SparkSession, dir: String): String = {
    val hs = graft.multimodal.JdkCodecs.pHashes(
        graft.multimodal.JdkCodecs.pngNearDupFixture(t(s, dir, "documents")),
        "doc_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val values = hs.map { case (id, h) => s"($id, CAST($h AS BIGINT))" }
      .mkString(",\n    ")
    s"""WITH h(doc_id, phash) AS (VALUES
       |    $values),
       |b AS (SELECT doc_id, phash, blk,
       |        (phash >> (blk * 16)) & 65535 AS key
       |      FROM h, unnest(generate_series(0, 3)) AS t(blk)),
       |p AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
       |        bit_count(xor(a.phash, c.phash)) AS hamming
       |      FROM b a JOIN b c ON a.blk = c.blk AND a.key = c.key
       |        AND a.doc_id < c.doc_id)
       |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM p
       |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin
  }
}
