package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization + URL-level dedup — the provenance-key step of a
 * crawl-corpus pipeline (C4/CommonCrawl practice: the same page is fetched
 * many times under syntactically different URLs; collapsing by a canonical
 * form is the cheapest, highest-precision dedup pass and runs BEFORE any
 * content hashing).
 *
 * Canonical form (each step deterministic string algebra, so any engine
 * replays it — the driver oracle hash-certifies the whole chain):
 *   1. trim; strip the `#fragment` (never sent to the server);
 *   2. scheme and host fold to lower case (case-insensitive per RFC 3986);
 *      the path/query case is PRESERVED (case-sensitive); userinfo
 *      (`user:pass@`) is stripped from the authority;
 *   3. a leading `www.` is dropped from the host, and a trailing `.` (the
 *      FQDN root dot — `example.com.` resolves identically to
 *      `example.com`) is stripped;
 *   4. default ports are dropped (`:80` for http, `:443` for https);
 *      non-default ports stay;
 *   5. trailing `/` runs are stripped from the path;
 *   6. percent-encoded triplets in the path and query fold their hex
 *      digits to UPPER case (`%2f` → `%2F`, RFC 3986 §6.2.2.1 — the two
 *      spellings address the same octet); a `%` not followed by two hex
 *      digits is left verbatim (it is not an escape). `+` is NOT folded
 *      to `%20`: that equivalence is form-encoding-specific and only
 *      holds in queries, so folding it would merge distinct paths — a
 *      deliberate recall trade, like preserving path/query case;
 *   7. query parameters: tracking params ([[trackingParams]]) are removed
 *      by name, the rest are SORTED (param order is not semantic for the
 *      overwhelming majority of pages — the standard crawl-dedup trade;
 *      sorting happens AFTER the percent-case fold), empty fragments
 *      dropped, and the `?` disappears with the last param.
 * A string that does not start with `scheme://` is not a URL; it passes
 * through trimmed and otherwise untouched (fail-soft: garbage provenance
 * is data, not an exception).
 *
 * Scale shape: [[canonicalizeUrl]] is a narrow codegen'd string-function
 * chain — scan speed, no shuffle, no UDF. [[dedupByUrl]] is one exact
 * hash-aggregation on the canonical key (`min(struct(...))` partial+final,
 * the skew-proof [[graft.operators.Dedup.exactDedup]] shape — a hot URL
 * collapses map-side).
 */
object UrlNormalize {

  /** Tracking/attribution parameters stripped by name (lower-cased
    * comparison). The usual analytics suspects; extend per corpus. `ref` is
    * deliberately NOT here (r12 review): unlike utm_* or gclid it is widely
    * semantic — a git host's `?ref=branch` selects different content — so
    * stripping it would merge genuinely different pages. */
  val trackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid")

  /** The canonical form of a URL column — see the object scaladoc for the
    * exact step list. Null in, null out.
    *
    * Regex portability (r12 review): end anchors are `\z` (true
    * end-of-string in BOTH Java regex and RE2 — Java's `$` also matches
    * before a final line terminator, RE2's does not, so a trailing newline
    * split the engines); whitespace trimming is an explicit `[ \t\r\n]`
    * class (both engines' built-in trim strips spaces only); the fragment
    * strip uses `[\s\S]*` so a fragment containing a newline is removed
    * whole. Userinfo (`user:pass@`) is stripped from the authority — the
    * crawl-canonicalization convention — rather than being misparsed as the
    * host. */
  /** Fold the hex digits of every valid percent-triplet to upper case,
    * leaving a bare `%` (not followed by two hex digits) verbatim. Neither
    * Java regex nor RE2 supports case-conversion in a replacement, so the
    * fold is split-on-`%` + per-piece `upper(substr(…,1,2))` + rejoin —
    * still a codegen'd array expression, no UDF, and the identical algebra
    * replays in the oracle (`list_transform` with a 1-based index there,
    * 0-based here). */
  private def pctUpper(s: Column): Column =
    array_join(
      transform(split(s, "%", -1), (p, i) =>
        when(i === 0 || !p.rlike("^[0-9a-fA-F]{2}"), p)
          .otherwise(concat(upper(p.substr(lit(1), lit(2))),
            p.substr(lit(3), length(p))))),
      "%")

  def canonicalizeUrl(url: Column): Column = {
    val u = regexp_replace(url, "^[ \\t\\r\\n]+|[ \\t\\r\\n]+\\z", "")
    val noFrag = regexp_replace(u, "#[\\s\\S]*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val authority = regexp_extract(rest, "^([^/?]*)", 1)
    val pathq = rest.substr(length(authority) + lit(1), length(rest))
    val hostport = regexp_replace(authority, "^[\\s\\S]*@", "")
    // fold case, strip the FQDN root dot, then the leading www.
    val host = regexp_replace(regexp_replace(
      lower(regexp_extract(hostport, "^([^:]*)", 1)), "\\.\\z", ""),
      "^www\\.", "")
    // Authority sanity gate (r12 review): a NON-numeric "port"
    // (`host:8x80`) used to vanish silently — the port regex matched
    // nothing while the host regex truncated at the colon, merging the URL
    // with the portless one and stealing its provenance; a bracketed IPv6
    // authority (`[::1]:8080`) was mangled the same way. Neither shape can
    // be canonicalized by this string algebra, so both pass through
    // verbatim (garbage provenance is data, not an exception).
    val hostportOk = hostport.rlike("^[^:\\[\\]]*(:[0-9]+)?\\z")
    val port = regexp_extract(hostport, ":([0-9]+)\\z", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    // percent-case fold BEFORE path/query extraction ('%3F' never splits as
    // a literal '?', so folding first is safe) and before the param sort
    val pathqN = pctUpper(pathq)
    val path = regexp_replace(regexp_extract(pathqN, "^([^?]*)", 1), "/+\\z", "")
    val tracking = array(trackingParams.map(lit): _*)
    val params = array_sort(filter(split(
        regexp_extract(pathqN, "\\?([\\s\\S]*)", 1), "&"),
      p => p =!= "" &&
        !array_contains(tracking, lower(regexp_extract(p, "^([^=]*)", 1)))))
    val query = array_join(params, "&")
    val canonical = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
    when(scheme === "" || !hostportOk, u).otherwise(canonical)
  }

  /**
   * URL-level exact dedup: one row per canonical URL, keeping the MINIMUM
   * (id) row — deterministic, engine-portable. Emits
   * (canonical_url, n_copies, keeper id + carried columns). One exact
   * hash-aggregation; the `min(struct(idCol, carried…))` partial aggregate
   * collapses a hot URL's copies map-side (no Window, no skew cliff).
   *
   * `keepBestBy = Some(scoreCol)` switches the keeper policy to the
   * C4/RefinedWeb quality rule — keep the member with the HIGHEST score,
   * id ASC on ties ([[graft.operators.Dedup.keepBestPerCluster]]'s
   * `(score DESC, id ASC)` order, same skew-proof single-aggregate shape:
   * the composite `max(struct(score, -id, row))` key decides on (score,
   * -id) — unique per row — and carries the keeper's row along). The score
   * column is consumed for the decision, not emitted; list it in
   * `carryCols` to also carry it through. NULL scores lose to any non-null
   * score; an all-null group keeps its minimum id.
   */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String,
                 carryCols: Seq[String] = Seq.empty,
                 keepBestBy: Option[String] = None): DataFrame = {
    // loud reserved-name guard (r12 review): an input already carrying
    // canonical_url would be silently overwritten; n_copies in carryCols
    // would emit duplicate output columns that throw far downstream
    val reserved = Seq("canonical_url", "n_copies", "__keep", "__kb")
    val clashes = (df.columns.toSeq ++ carryCols).filter(reserved.contains)
    require(clashes.isEmpty,
      s"dedupByUrl: column(s) ${clashes.distinct.mkString(", ")} collide " +
        s"with the output schema (${reserved.mkString(", ")}) — rename them")
    keepBestBy.foreach { sc =>
      require(df.columns.contains(sc),
        s"dedupByUrl: keepBestBy column $sc is not an input column")
      // the composite-max key negates the id for the ASC tie-break; on a
      // non-numeric id the UnaryMinus null-coerces (or throws under ANSI)
      // and the tie-break silently inverts — fail loudly instead (r14
      // review). The default min(struct) path keeps supporting string ids.
      require(df.schema(idCol).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"dedupByUrl: keepBestBy requires a numeric id column for the " +
          s"(score DESC, id ASC) tie-break; $idCol is " +
          s"${df.schema(idCol).dataType.simpleString} — pre-map it to a " +
          s"numeric surrogate or use the default min-id policy")
    }
    val canon = df.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
    val row = struct((idCol +: carryCols).map(col): _*)
    val agged = keepBestBy match {
      case None =>
        canon.groupBy("canonical_url")
          .agg(count(lit(1)).as("n_copies"), min(row).as("__keep"))
      case Some(sc) =>
        canon.groupBy("canonical_url")
          .agg(count(lit(1)).as("n_copies"),
            max(struct(col(sc).as("s"), (-col(idCol)).as("ni"),
              row.as("r"))).as("__kb"))
          .select(col("canonical_url"), col("n_copies"),
            col("__kb.r").as("__keep"))
    }
    agged.select(col("canonical_url") +: col("n_copies") +:
      (idCol +: carryCols).map(c => col(s"__keep.$c").as(c)): _*)
  }
}
