"""LLM-facing output shaping — XML rendering + pagination tokens as PLAN ops.

Reference: crates/mcp/src/tools/xml.rs:1-205 (XmlBuilder: ToolResponse >
definitions > definition{name,fqn,definition-type,location,context}, CDATA
stripped for LLM consumption via to_xml_without_cdata) and
search_codebase_definitions.rs:96-148 (ToXml impl), :279 (location format
``{file}:L{start}-{end}``), :286-291 (next_page = page+1 iff the page is
full), :306-355 (system message + decision framework).

The reference formats rows in Rust after the query returns; here the entire
document render IS the query plan — per-row fragments are Catalyst string
expressions, the document is one sorted string-agg, and the pagination token
falls out of the same aggregation. No driver-side loop touches row data, so
shaping scales with the page size, not the corpus, and the formatted corpus
export (``xml_export`` over every definition) distributes like any other
aggregation.

Determinism contract: fragment order is pinned by (fqn, start_line) both in
the ``sort_array``/``string_agg ORDER BY`` and in the page SELECT, so the
rendered document is byte-identical across engines — hash-comparable by the
driver like any other query.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knowledge_graph_spark.graph.model import KnowledgeGraph

# Decision-framework literals (search_codebase_definitions.rs:306-355). Kept
# as single Python constants and INJECTED into the oracle SQL so both engines
# render the identical bytes.
FOUND_FRAMEWORK = (
    "Decision Framework:\n"
    "  - If sufficient context for your current task is provided in the results, you can stop here.\n"
    "  - If you've found a definition you want to examine further, use the `get_references` tool to examine the references to the relevant symbol.\n"
    "  - If you've found a definition you want to read the implementation of, use the `read_definitions` tool to read the implementation.\n"
    "  - If the results revealed a new relevant symbol, use the `search_codebase_definitions` tool again with different search terms to explore further.\n"
)
EMPTY_FRAMEWORK = (
    "Decision Framework:\n"
    "  - If you know for sure that definitions exists for the search terms, you can use the `index_project` tool to re-index the project and try again.\n"
    "  - If you know for sure that definitions exists for the search terms, and the indexing is up to date, you can stop using the Knowledge Graph for getting definitions for the requested search terms.\n"
)


def xml_escape(c: Column) -> Column:
    """Text-node escaping (& first, then angle brackets) — the same three
    replaces, in the same order, as the oracle's ``_XML_ESC_SQL``."""
    return F.replace(
        F.replace(
            F.replace(c, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;")
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )


def _xml_esc_sql(expr: str) -> str:
    return (
        "replace(replace(replace(" + expr + ", '&', '&amp;'), '<', '&lt;'), "
        "'>', '&gt;')"
    )


#: Per-definition fragment (xml.rs 2-space indent; CDATA already stripped, so
#: <context> holds the raw snippet flanked by newlines like
#: write_cdata_element does).
_FRAG_FMT = (
    "    <definition>\n"
    "      <name>%s</name>\n"
    "      <fqn>%s</fqn>\n"
    "      <definition-type>%s</definition-type>\n"
    "      <location>%s:L%d-%d</location>\n"
    "      <context>\n%s\n      </context>\n"
    "    </definition>"
)


def search_definitions_xml(
    kg: KnowledgeGraph,
    terms: list[str],
    page: int = 1,
    page_size: int = 50,
    context_lines: int = 2,
    project_path: str = "/repo",
) -> DataFrame:
    """search_codebase_definitions with the full serving-layer shaping:
    context enrichment + XML render + next-page token + system message,
    returned as ONE row ``(xml, next_page, n_results, system_message)``.

    Plan shape: page SELECT (pushdown filter + order + limit) → broadcast
    context join (page_size rows against the per-line inventory) → per-row
    fragment render (JVM string expressions) → one global sorted aggregation.
    The only shuffle after the page is the 1-row final agg."""
    terms_lc = [t.lower() for t in terms]
    name_lc = F.lower(F.col("name"))
    pred = reduce(lambda a, b: a | b, [name_lc.contains(t) for t in terms_lc])
    hits = (
        kg.definitions.filter(pred)
        .select(
            "fqn", "name", "definition_type", "primary_file_path",
            "start_line", "end_line",
        )
        .orderBy("fqn", "start_line")
        .offset((page - 1) * page_size)
        .limit(page_size)
    )
    ctx = int(context_lines)
    from knowledge_graph_spark.queries.library import _context_lines

    # real ±N source lines from the indexed file-text inventory
    # (file_reader_utils.rs:1-252), falling back to the definition-derived
    # rendering for graphs without stored content
    lines = _context_lines(kg)
    j = F.broadcast(hits).join(
        lines,
        (hits.primary_file_path == lines._path)
        & (lines._line >= hits.start_line - ctx)
        & (lines._line <= hits.start_line + ctx),
    )
    snippet = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_line", "_rendered"))),
            lambda s: s["_rendered"],
        ),
        "\n",
    )
    enriched = j.groupBy(
        "fqn", "name", "definition_type", "primary_file_path",
        "start_line", "end_line",
    ).agg(snippet.alias("snippet"))
    frag = F.format_string(
        _FRAG_FMT,
        xml_escape(F.col("name")),
        xml_escape(F.col("fqn")),
        xml_escape(F.col("definition_type")),
        xml_escape(F.col("primary_file_path")),
        F.col("start_line"),
        F.col("end_line"),
        xml_escape(F.col("snippet")),
    )
    doc = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("fqn", "start_line", "frag"))),
            lambda s: s["frag"],
        ),
        "\n",
    )
    agg = enriched.withColumn("frag", frag).groupBy().agg(
        doc.alias("defs"), F.count(F.lit(1)).alias("n_results")
    )
    terms_str = ", ".join(terms)
    next_page = F.when(
        F.col("n_results") == page_size, F.lit(page + 1).cast("long")
    ).otherwise(F.lit(None).cast("long"))
    found_msg = F.format_string(
        "Found a total of %d definitions for the search terms (%s) in the project %s.\n"
        + FOUND_FRAMEWORK.replace("%", "%%"),
        F.col("n_results"),
        F.lit(terms_str),
        F.lit(project_path),
    )
    empty_msg = F.lit(
        f"No indexed definitions found for the search terms ({terms_str}) "
        f"in the project {project_path}.\n" + EMPTY_FRAMEWORK
    )
    more = F.when(
        next_page.isNotNull(),
        F.format_string(
            "There are more results on page %d if more context is needed for the current task.",
            next_page,
        ),
    ).otherwise(F.lit(""))
    system_message = F.concat(
        F.when(F.col("n_results") > 0, found_msg).otherwise(empty_msg), more
    )
    xml = F.concat(
        F.lit("<ToolResponse>\n  <definitions>\n"),
        F.when(F.col("n_results") > 0, F.concat(F.col("defs"), F.lit("\n"))).otherwise(
            F.lit("")
        ),
        F.lit("  </definitions>\n"),
        F.when(
            next_page.isNotNull(),
            F.format_string("  <next-page>%d</next-page>\n", next_page),
        ).otherwise(F.lit("")),
        F.lit("  <system-message>\n"),
        system_message,
        F.lit("\n  </system-message>\n</ToolResponse>"),
    )
    return agg.select(
        xml.alias("xml"),
        next_page.alias("next_page"),
        F.col("n_results"),
        system_message.alias("system_message"),
    )


# -- DuckDB oracle ----------------------------------------------------------

_FRAG_SQL_FMT = _FRAG_FMT  # printf in DuckDB shares the %s/%d vocabulary


def search_definitions_xml_sql(
    any_pred: str,
    terms_str: str,
    page: int,
    page_size: int,
    ctx: int,
    project_path: str = "/repo",
) -> str:
    """Oracle twin: identical bytes via the same format strings, escapes and
    (fqn, start_line) agg order. Passed as the full SELECT (needs hits CTE
    via extra_ctes)."""

    def sq(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    frag = (
        "printf(" + sq(_FRAG_SQL_FMT) + ", "
        + _xml_esc_sql("e.name") + ", "
        + _xml_esc_sql("e.fqn") + ", "
        + _xml_esc_sql("e.definition_type") + ", "
        + _xml_esc_sql("e.primary_file_path")
        + ", e.start_line, e.end_line, "
        + _xml_esc_sql("e.snippet") + ")"
    )
    found_msg = (
        f"printf('Found a total of %d definitions for the search terms (%s) "
        f"in the project %s.' || chr(10) || {sq(FOUND_FRAMEWORK)}, "
        f"a.n_results, {sq(terms_str)}, {sq(project_path)})"
    )
    empty_msg = sq(
        f"No indexed definitions found for the search terms ({terms_str}) "
        f"in the project {project_path}.\n" + EMPTY_FRAMEWORK
    )
    return f"""
SELECT
  '<ToolResponse>' || chr(10) || '  <definitions>' || chr(10)
    || CASE WHEN a.n_results > 0 THEN a.defs || chr(10) ELSE '' END
    || '  </definitions>' || chr(10)
    || CASE WHEN a.n_results = {page_size}
            THEN printf('  <next-page>%d</next-page>', {page + 1}) || chr(10)
            ELSE '' END
    || '  <system-message>' || chr(10)
    || (CASE WHEN a.n_results > 0 THEN {found_msg} ELSE {empty_msg} END
        || CASE WHEN a.n_results = {page_size}
                THEN printf('There are more results on page %d if more context is needed for the current task.', {page + 1})
                ELSE '' END)
    || chr(10) || '  </system-message>' || chr(10) || '</ToolResponse>' AS xml,
  CASE WHEN a.n_results = {page_size} THEN CAST({page + 1} AS BIGINT) END AS next_page,
  a.n_results,
  (CASE WHEN a.n_results > 0 THEN {found_msg} ELSE {empty_msg} END
   || CASE WHEN a.n_results = {page_size}
           THEN printf('There are more results on page %d if more context is needed for the current task.', {page + 1})
           ELSE '' END) AS system_message
FROM (
  SELECT coalesce(string_agg({frag}, chr(10) ORDER BY e.fqn, e.start_line), '') AS defs,
         CAST(count(*) AS BIGINT) AS n_results
  FROM (
    SELECT h.fqn, h.name, h.definition_type, h.primary_file_path,
           h.start_line, h.end_line,
           string_agg(l.line_text, chr(10) ORDER BY l.line_no, l.line_text)
             AS snippet
    FROM hits h
    JOIN file_lines l
      ON l.path = h.primary_file_path
     AND l.line_no BETWEEN h.start_line - {ctx} AND h.start_line + {ctx}
    GROUP BY 1, 2, 3, 4, 5, 6
  ) e
) a
"""


SEARCH_XML_HITS_CTE = """hits AS (
  SELECT fqn, name, definition_type, primary_file_path, start_line, end_line
  FROM definition_nodes
  WHERE {any_pred}
  ORDER BY fqn, start_line
  LIMIT {limit} OFFSET {offset}
)"""


# ---------------------------------------------------------------------------
# import_usage XML shaping (crates/mcp/src/tools/import_usage)
# ---------------------------------------------------------------------------

#: Per-file block (output.rs:18-49 via XmlBuilder indent 2; CDATA stripped,
#: text flanked by newlines like write_cdata_element). imports/usages bodies
#: are pre-rendered line runs each ending '\n' (service.rs:168-204), so the
#: closing tag lands after the body's final newline.
_FILE_FMT = (
    "  <file>\n"
    "    <path>%s</path>\n"
    "    <imports>\n%s    </imports>\n"
    "    <usages>\n%s    </usages>\n"
    "  </file>"
)


def import_usage_xml(
    kg: KnowledgeGraph,
    import_paths: list[str],
    page: int = 1,
    page_size: int = 50,
) -> DataFrame:
    """The import_usage MCP tool's full render (import_usage/service.rs:
    29-225, output.rs:18-49): per-file blocks pairing the matched import
    statements' source lines (``import {text} L{s}-{e}``) with every usage
    site (``usage {fqn} L{s}-{e}`` + '│ '-prefixed source snippet), file set
    paginated, one row ``(xml, next_page, n_files, system_message)``.

    Line labels are 1-based (+1 like repository.rs:108-124); snippets come
    from the indexed file-line inventory (the reference reads the worktree,
    file_reader_utils.rs). Spark trim == DuckDB trim (space-only) — a
    documented divergence from Rust's str::trim for snippets that start or
    end with tabs.

    Plan shape (fused, round 4; page-first, round 5): import statements and
    usage sites are tagged rows of ONE item frame — a single distinct, a
    single broadcast range-join against the line inventory, a single snippet
    aggregation, and ONE groupBy(path) assembling BOTH block strings via
    conditional collect_list. Round 5 moved PAGINATION IN FRONT of the
    expensive work: the page's file set is chosen from a slim distinct-path
    frame first, and the item distinct, snippet range-join, and render then
    touch only the page's files — the r4 shape assembled snippets for every
    matched usage site in the corpus (276 k items at sf0.1) to emit 50 file
    blocks. Nothing leaves the JVM.
    """
    from knowledge_graph_spark import schema as S
    from knowledge_graph_spark.queries.library import _context_lines

    paths_lc = [p.lower() for p in import_paths]
    lines = _context_lines(kg)

    # -- tagged item frame: kind 0 = import statement, kind 1 = usage site.
    # fqn/def_start use sentinels (not NULLs) so the snippet join-back keys
    # stay equi-joinable.
    imp_match = kg.imports.filter(F.lower(F.col("import_path")).isin(paths_lc))
    items_imp = imp_match.select(
        F.lit(0).alias("kind"),
        F.col("file_path").alias("path"),
        F.col("start_line").alias("s"),
        F.col("end_line").alias("e"),
        F.lit("").alias("fqn"),
        F.lit(-1).alias("def_start"),
    )
    imp_ids = imp_match.select(F.col("id").alias("_imp_id"))
    # the usage-edge side is bounded by the requested paths (it is broadcast
    # again for the page render below) — hint it EXPLICITLY so the
    # definitions lookup is a deterministic BroadcastHashJoin whatever the
    # session's cache/statistics state; un-hinted, the un-materialized
    # definitions plan estimate can exceed the auto threshold and flip this
    # to a SortMergeJoin (r9, guide §3.1: hint when you know the side)
    items_use = (
        F.broadcast(
            kg.edge("definition_relationships", S.REFERENCE_EDGE_TYPES)
            .filter(F.col("target_table") == "imported_symbol_nodes")
            .alias("r")
            .join(F.broadcast(imp_ids), F.col("r.target_id") == F.col("_imp_id"))
        )
        .join(kg.definitions.alias("src"), F.col("r.source_id") == F.col("src.id"))
        .select(
            F.lit(1).alias("kind"),
            F.col("src.primary_file_path").alias("path"),
            F.coalesce(F.col("r.source_start_line"), F.col("src.start_line")).alias("s"),
            F.coalesce(F.col("r.source_end_line"), F.col("src.end_line")).alias("e"),
            F.col("src.fqn").alias("fqn"),
            F.col("src.start_line").alias("def_start"),
        )
    )
    # pinned (r8): the tagged item frame — bounded by the matched imports'
    # usage sites for ≤ a handful of requested paths — feeds the page
    # selection collect AND the page-restricted render; un-pinned, the
    # imports-filter ⋈ edges ⋈ definitions subtree ran twice per call
    from knowledge_graph_spark.persist import pin_small

    all_items = pin_small(items_imp.unionByName(items_use))

    # -- page-first: pick the page's file set (and the corpus-wide file
    # total for next-page) from a slim distinct over paths alone, BEFORE any
    # snippet work — the r4 shape assembled snippets for every matched usage
    # site in the corpus to emit page_size file blocks. The page selection
    # is a bounded driver collect (≤ page_size paths + one total, the same
    # LIMIT-bounded pattern as every serving result); the paths then push
    # down as literal isin filters, so the snippet range-join and render
    # touch only the page's files and the main plan reads the item subtree
    # ONCE instead of re-deriving it behind a broadcast-window barrier.
    from pyspark.sql import Window

    sel = (
        all_items.select("path")
        .distinct()
        .withColumn("_rn", F.row_number().over(Window.orderBy("path")))
        .withColumn("_total", F.count(F.lit(1)).over(Window.partitionBy()))
        .filter(
            (F.col("_rn") > (page - 1) * page_size)
            & (F.col("_rn") <= page * page_size)
        )
        .select("path", "_total")
        .collect()
    )
    page_list = [r["path"] for r in sel]
    total_files = int(sel[0]["_total"]) if sel else 0
    items = all_items.filter(F.col("path").isin(page_list)).distinct()

    # -- ONE broadcast range-join for source text (the page-sized item set
    # broadcasts; the line inventory stays the stream), ONE snippet agg.
    # A LEFT OUTER join cannot broadcast its left side, so the no-lines rows
    # rejoin via the broadcast right-side left join below.
    j = F.broadcast(items).join(
        lines,
        (items.path == lines._path)
        & (lines._line >= items.s)
        & (lines._line <= items.e),
    )
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("_line", "_rendered"))),
        lambda st: st["_rendered"],
    )
    snips = j.groupBy("kind", "path", "s", "e", "fqn", "def_start").agg(
        # import statements render whitespace-collapsed on one line;
        # usage snippets keep their line structure
        F.regexp_replace(F.trim(F.array_join(ordered, " ")), r"\s+", " ").alias("src"),
        F.trim(F.array_join(ordered, "\n")).alias("snippet"),
    )
    rows = items.join(
        F.broadcast(snips), ["kind", "path", "s", "e", "fqn", "def_start"], "left"
    )

    entry = F.when(
        F.col("kind") == 0,
        F.format_string(
            "import %s L%d-%d\n",
            F.coalesce(F.col("src"), F.lit("")),
            F.col("s") + 1,
            F.col("e") + 1,
        ),
    ).otherwise(
        F.concat(
            F.format_string(
                "usage %s L%d-%d\n", F.col("fqn"), F.col("s") + 1, F.col("e") + 1
            ),
            F.when(F.col("s") >= F.col("def_start"), F.lit("│ ...\n")).otherwise(F.lit("")),
            F.when(
                F.col("snippet") != "",
                F.concat(
                    F.lit("│ "),
                    F.replace(F.col("snippet"), F.lit("\n"), F.lit("\n│ ")),
                    F.lit("\n"),
                ),
            ).otherwise(F.lit("")),
            F.lit("\n"),
        )
    )

    # -- ONE groupBy(path) assembling both block strings (conditional
    # collect_list: a null struct from the unmatched kind is skipped); the
    # frame is already page-restricted, so the join back to page_paths only
    # attaches the corpus-wide _total for next-page arithmetic
    _kind = F.col("kind")
    files = (
        rows.withColumn("entry", entry)
        .groupBy("path")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(_kind == 0, F.struct("s", "e", "entry"))
                        )
                    ),
                    lambda st: st["entry"],
                ),
                "",
            ).alias("imports_text"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                _kind == 1,
                                F.struct("s", "e", "fqn", "def_start", "entry"),
                            )
                        )
                    ),
                    lambda st: st["entry"],
                ),
                "",
            ).alias("usages_text"),
        )
    )
    block = F.format_string(
        _FILE_FMT,
        xml_escape(F.col("path")),
        F.col("imports_text"),
        F.col("usages_text"),
    )
    agg = files.withColumn("block", block).groupBy().agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("path", "block"))),
                lambda s: s["block"],
            ),
            "\n",
        ).alias("files_xml"),
        F.count(F.lit(1)).alias("n_files"),
    )
    # next-page arithmetic is driver-side: the corpus-wide file total came
    # back with the page selection
    next_page = (
        F.lit(page + 1).cast("long")
        if total_files > page * page_size
        else F.lit(None).cast("long")
    )
    system_message = F.format_string(
        "Returned %d file block(s). page=%d page_size=%d.%s",
        F.col("n_files"),
        F.lit(page),
        F.lit(page_size),
        F.when(next_page.isNotNull(), F.lit(" More results available via next-page.")).otherwise(
            F.lit("")
        ),
    )
    xml = F.concat(
        F.lit("<ToolResponse>\n"),
        F.when(F.col("n_files") > 0, F.concat(F.col("files_xml"), F.lit("\n"))).otherwise(
            F.lit("")
        ),
        F.when(
            next_page.isNotNull(),
            F.format_string("  <next-page>%d</next-page>\n", next_page),
        ).otherwise(F.lit("")),
        F.lit("  <system-message>\n"),
        system_message,
        F.lit("\n  </system-message>\n</ToolResponse>"),
    )
    return agg.select(
        xml.alias("xml"),
        next_page.alias("next_page"),
        F.col("n_files"),
        system_message.alias("system_message"),
    )


def import_usage_xml_sql(paths_subquery: str, page: int, page_size: int) -> str:
    """Oracle twin of import_usage_xml: identical bytes via the same format
    strings, orderings, and space-only trim. ``paths_subquery`` yields the
    lowercased import paths."""
    off = (page - 1) * page_size
    end = page * page_size
    return f"""
SELECT
  '<ToolResponse>' || chr(10)
    || CASE WHEN a.n_files > 0 THEN a.files_xml || chr(10) ELSE '' END
    || CASE WHEN a.total > {end}
            THEN printf('  <next-page>%d</next-page>', {page + 1}) || chr(10)
            ELSE '' END
    || '  <system-message>' || chr(10)
    || printf('Returned %d file block(s). page=%d page_size=%d.%s',
              a.n_files, {page}, {page_size},
              CASE WHEN a.total > {end}
                   THEN ' More results available via next-page.' ELSE '' END)
    || chr(10) || '  </system-message>' || chr(10) || '</ToolResponse>' AS xml,
  CASE WHEN a.total > {end} THEN CAST({page + 1} AS BIGINT) END AS next_page,
  a.n_files,
  printf('Returned %d file block(s). page=%d page_size=%d.%s',
         a.n_files, {page}, {page_size},
         CASE WHEN a.total > {end}
              THEN ' More results available via next-page.' ELSE '' END)
    AS system_message
FROM (
  SELECT coalesce(string_agg(p.block, chr(10) ORDER BY p.path), '') AS files_xml,
         CAST(count(*) AS BIGINT) AS n_files,
         coalesce(max(p.total), 0) AS total
  FROM (
    SELECT f.path, f.total,
           printf('  <file>' || chr(10)
                  || '    <path>%s</path>' || chr(10)
                  || '    <imports>' || chr(10) || '%s    </imports>' || chr(10)
                  || '    <usages>' || chr(10) || '%s    </usages>' || chr(10)
                  || '  </file>',
                  replace(replace(replace(f.path, '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                  f.imports_text, f.usages_text) AS block,
           row_number() OVER (ORDER BY f.path) AS rn
    FROM (
      SELECT coalesce(it.path, ut.path) AS path,
             coalesce(it.imports_text, '') AS imports_text,
             coalesce(ut.usages_text, '') AS usages_text,
             count(*) OVER () AS total
      FROM (
        SELECT path,
               string_agg(printf('import %s L%d-%d', src, start_line + 1, end_line + 1)
                          || chr(10), '' ORDER BY start_line, end_line) AS imports_text
        FROM (
          SELECT i.path, i.start_line, i.end_line,
                 coalesce(regexp_replace(trim(string_agg(l.line_text, ' '
                                ORDER BY l.line_no, l.line_text)),
                                '\\s+', ' ', 'g'), '') AS src
          FROM (SELECT DISTINCT file_path AS path, start_line, end_line
                FROM imported_symbol_nodes
                WHERE lower(import_path) IN ({paths_subquery})) i
          LEFT JOIN file_lines l
            ON l.path = i.path AND l.line_no BETWEEN i.start_line AND i.end_line
          GROUP BY 1, 2, 3
        ) imp_src GROUP BY path
      ) it
      FULL OUTER JOIN (
        SELECT path,
               string_agg(
                 printf('usage %s L%d-%d', fqn, rs + 1, re + 1) || chr(10)
                 || CASE WHEN rs >= def_start THEN '│ ...' || chr(10) ELSE '' END
                 || CASE WHEN snippet IS NOT NULL AND snippet <> ''
                         THEN '│ ' || replace(snippet, chr(10), chr(10) || '│ ') || chr(10)
                         ELSE '' END
                 || chr(10), '' ORDER BY rs, re, fqn, def_start) AS usages_text
        FROM (
          SELECT u.path, u.rs, u.re, u.fqn, u.def_start,
                 trim(string_agg(l.line_text, chr(10)
                                 ORDER BY l.line_no, l.line_text)) AS snippet
          FROM (
            SELECT DISTINCT d.primary_file_path AS path,
                   COALESCE(r.source_start_line, d.start_line) AS rs,
                   COALESCE(r.source_end_line, d.end_line) AS re,
                   d.fqn, d.start_line AS def_start
            FROM definition_relationships r
            JOIN imported_symbol_nodes i
              ON i.id = r.target_id AND r.target_table = 'imported_symbol_nodes'
             AND lower(i.import_path) IN ({paths_subquery})
            JOIN definition_nodes d ON d.id = r.source_id
            WHERE r.type IN ('CALLS','AMBIGUOUSLY_CALLS','PROPERTY_REFERENCE')
          ) u
          LEFT JOIN file_lines l
            ON l.path = u.path AND l.line_no BETWEEN u.rs AND u.re
          GROUP BY 1, 2, 3, 4, 5
        ) ref_src GROUP BY path
      ) ut ON it.path = ut.path
    ) f
  ) p
  WHERE p.rn > {off} AND p.rn <= {end}
) a
"""


# ---------------------------------------------------------------------------
# get_references XML shaping (crates/mcp/src/tools/get_references)
# ---------------------------------------------------------------------------

#: Decision-framework literals (get_references/service.rs:215-231).
REFS_FOUND_FRAMEWORK = (
    "\nDecision Framework:\n"
    "  - If your current task is to find all references to a definition, you can stop here.\n"
    "  - If you're analyzing how a change might affect the codebase, use the `get_references` tool again to examine what references the symbols that point to your target definition.\n"
    "  - If you need more background about a definition that references your target symbol, use the `search_codebase_definitions` tool to explore further.\n"
)
REFS_EMPTY_FRAMEWORK = (
    "\nDecision Framework:\n"
    "  - If you know for sure that the definition is referenced somewhere, you can use the `index_project` tool to re-index the project and try again.\n"
    "  - If you know for sure that the definition is referenced somewhere, and the indexing is up to date, you can stop using the Knowledge Graph for getting references for the requested symbol.\n"
)

#: Per-reference fragment (output.rs:57-66; depth-4 under ToolResponse >
#: definitions > definition > references).
_REF_FRAG_FMT = (
    "        <reference>\n"
    "          <reference-type>%s</reference-type>\n"
    "          <location>%s:L%d-%d</location>\n"
    "          <context>\n%s\n          </context>\n"
    "        </reference>"
)
#: Per-definition fragment (output.rs:50-69) hosting its reference run.
_REF_DEF_FMT = (
    "    <definition>\n"
    "      <name>%s</name>\n"
    "      <location>%s:L%d-%d</location>\n"
    "      <definition-type>%s</definition-type>\n"
    "      <fqn>%s</fqn>\n"
    "      <references>\n%s\n      </references>\n"
    "    </definition>"
)


def get_references_xml(
    kg: KnowledgeGraph,
    definition_name: str,
    relative_file_path: str,
    page: int = 1,
    page_size: int = 50,
) -> DataFrame:
    """The get_references MCP tool's full render (get_references/service.rs:
    29-146, output.rs:44-78): referencing definitions grouped with their
    reference sites, each site carrying ±2 surrounding source lines clamped
    to the referencing definition's span (service.rs:70-74), one row
    ``(xml, next_page, n_results, system_message)``.

    The reference groups via HashMap (iteration order unspecified); here the
    definition groups are ordered by (fqn, start_line) and references within
    a group by (start_line, end_line, type) — deterministic in both engines.
    Line labels are 1-based like repository.rs:104-112.
    """
    from knowledge_graph_spark import schema as S
    from knowledge_graph_spark.queries.library import _context_lines

    target = kg.definitions.filter(
        (F.col("name") == definition_name)
        & (F.col("primary_file_path") == relative_file_path)
    ).select(F.col("id").alias("_tid"))
    # the ref-edge side is bounded by the one requested definition (and is
    # broadcast again for the context render below) — hint it so the
    # source-definition lookup stays a BroadcastHashJoin regardless of the
    # session's cache/statistics state (r9, guide §3.1)
    refs = (
        F.broadcast(
            kg.edge("definition_relationships", S.REFERENCE_EDGE_TYPES)
            .filter(F.col("target_table") == "definition_nodes")
            .alias("r")
            .join(F.broadcast(target), F.col("r.target_id") == F.col("_tid"))
        )
        .join(kg.definitions.alias("t"), F.col("r.source_id") == F.col("t.id"))
        .select(
            F.col("t.name").alias("dname"),
            F.col("t.fqn").alias("dfqn"),
            F.col("t.definition_type").alias("dtype"),
            F.col("t.primary_file_path").alias("dpath"),
            F.col("t.start_line").alias("ds"),
            F.col("t.end_line").alias("de"),
            F.coalesce(F.col("r.source_start_line"), F.col("t.start_line")).alias("rs"),
            F.coalesce(F.col("r.source_end_line"), F.col("t.end_line")).alias("re"),
            F.col("r.type").alias("rtype"),
        )
        .orderBy("dfqn", "ds", "rs", "re", "rtype")
        .offset((page - 1) * page_size)
        .limit(page_size)
    )
    lines = _context_lines(kg)
    cs = F.greatest(refs.rs - 2, refs.ds)
    ce = F.least(refs.re + 2, refs.de)
    j = F.broadcast(refs).join(
        lines,
        (refs.dpath == lines._path) & (lines._line >= cs) & (lines._line <= ce),
    )
    ctx = F.trim(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_line", "_rendered"))),
                lambda s: s["_rendered"],
            ),
            "\n",
        )
    )
    keys = ["dname", "dfqn", "dtype", "dpath", "ds", "de", "rs", "re", "rtype"]
    snips = j.groupBy(*keys).agg(ctx.alias("ctx"))
    per_ref = refs.join(F.broadcast(snips), keys, "left")
    ref_frag = F.format_string(
        _REF_FRAG_FMT,
        xml_escape(F.col("rtype")),
        xml_escape(F.col("dpath")),
        F.col("rs") + 1,
        F.col("re") + 1,
        xml_escape(F.coalesce(F.col("ctx"), F.lit(""))),
    )
    per_def = (
        per_ref.withColumn("rf", ref_frag)
        .groupBy("dname", "dfqn", "dtype", "dpath", "ds", "de")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rs", "re", "rtype", "rf"))),
                    lambda s: s["rf"],
                ),
                "\n",
            ).alias("refs_xml"),
            F.count(F.lit(1)).alias("n_refs"),
        )
    )
    def_frag = F.format_string(
        _REF_DEF_FMT,
        xml_escape(F.col("dname")),
        xml_escape(F.col("dpath")),
        F.col("ds") + 1,
        F.col("de") + 1,
        xml_escape(F.col("dtype")),
        xml_escape(F.col("dfqn")),
        F.col("refs_xml"),
    )
    agg = per_def.withColumn("df", def_frag).groupBy().agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dfqn", "ds", "df"))),
                lambda s: s["df"],
            ),
            "\n",
        ).alias("defs_xml"),
        F.sum("n_refs").alias("n_results"),
    )
    n = F.coalesce(F.col("n_results"), F.lit(0))
    next_page = F.when(n >= page_size, F.lit(page + 1).cast("long")).otherwise(
        F.lit(None).cast("long")
    )
    more = F.when(
        next_page.isNotNull(),
        F.format_string(
            "There are more results on page %d if more context is needed for the current task.\n",
            next_page,
        ),
    ).otherwise(F.lit(""))
    found_msg = F.format_string(
        "Found a total of %d references for the definition %s in the file %s.\n"
        + REFS_FOUND_FRAMEWORK.replace("%", "%%"),
        n,
        F.lit(definition_name),
        F.lit(relative_file_path),
    )
    empty_msg = F.lit(
        f"No indexed references found for the definition {definition_name} "
        f"in the file {relative_file_path}.\n" + REFS_EMPTY_FRAMEWORK
    )
    system_message = F.concat(more, F.when(n > 0, found_msg).otherwise(empty_msg))
    xml = F.concat(
        F.lit("<ToolResponse>\n  <definitions>\n"),
        F.when(n > 0, F.concat(F.col("defs_xml"), F.lit("\n"))).otherwise(F.lit("")),
        F.lit("  </definitions>\n"),
        F.when(
            next_page.isNotNull(),
            F.format_string("  <next-page>%d</next-page>\n", next_page),
        ).otherwise(F.lit("")),
        F.lit("  <system-message>\n"),
        system_message,
        F.lit("  </system-message>\n</ToolResponse>"),
    )
    return agg.select(
        xml.alias("xml"),
        next_page.alias("next_page"),
        n.cast("long").alias("n_results"),
        system_message.alias("system_message"),
    )


def get_references_xml_sql(
    name_sql: str,
    path_sql: str,
    page: int,
    page_size: int,
) -> str:
    """Oracle twin of get_references_xml — identical bytes via the same
    format strings, escapes, clamped context windows, and orderings.
    ``name_sql``/``path_sql`` are SQL scalar expressions yielding the target
    definition's name and file (quoted literals, or data-derived subqueries
    so the oracle picks the same target at any scale factor)."""

    def sq(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    ref_frag = (
        "printf(" + sq(_REF_FRAG_FMT) + ", "
        + _xml_esc_sql("p.rtype") + ", "
        + _xml_esc_sql("p.dpath") + ", p.rs + 1, p.re + 1, "
        + _xml_esc_sql("coalesce(p.ctx, '')") + ")"
    )
    def_frag = (
        "printf(" + sq(_REF_DEF_FMT) + ", "
        + _xml_esc_sql("g.dname") + ", "
        + _xml_esc_sql("g.dpath") + ", g.ds + 1, g.de + 1, "
        + _xml_esc_sql("g.dtype") + ", "
        + _xml_esc_sql("g.dfqn") + ", g.refs_xml)"
    )
    more = (
        f"CASE WHEN a.n_results >= {page_size} THEN printf("
        f"'There are more results on page %d if more context is needed for the current task.' || chr(10), {page + 1}) ELSE '' END"
    )
    found_msg = (
        f"printf('Found a total of %d references for the definition %s in the file %s.' || chr(10) || {sq(REFS_FOUND_FRAMEWORK)}, "
        f"a.n_results, {name_sql}, {path_sql})"
    )
    empty_msg = (
        f"printf('No indexed references found for the definition %s in the file %s.' || chr(10) || {sq(REFS_EMPTY_FRAMEWORK)}, "
        f"{name_sql}, {path_sql})"
    )
    sysmsg = (
        f"({more} || CASE WHEN a.n_results > 0 THEN {found_msg} ELSE {empty_msg} END)"
    )
    return f"""
SELECT
  '<ToolResponse>' || chr(10) || '  <definitions>' || chr(10)
    || CASE WHEN a.n_results > 0 THEN a.defs_xml || chr(10) ELSE '' END
    || '  </definitions>' || chr(10)
    || CASE WHEN a.n_results >= {page_size}
            THEN printf('  <next-page>%d</next-page>', {page + 1}) || chr(10)
            ELSE '' END
    || '  <system-message>' || chr(10)
    || {sysmsg}
    || '  </system-message>' || chr(10) || '</ToolResponse>' AS xml,
  CASE WHEN a.n_results >= {page_size} THEN CAST({page + 1} AS BIGINT) END AS next_page,
  CAST(a.n_results AS BIGINT) AS n_results,
  {sysmsg} AS system_message
FROM (
  SELECT coalesce(string_agg({def_frag}, chr(10) ORDER BY g.dfqn, g.ds), '') AS defs_xml,
         coalesce(sum(g.n_refs), 0) AS n_results
  FROM (
    SELECT p.dname, p.dfqn, p.dtype, p.dpath, p.ds, p.de,
           string_agg({ref_frag}, chr(10) ORDER BY p.rs, p.re, p.rtype) AS refs_xml,
           count(*) AS n_refs
    FROM (
      SELECT h.*, trim(string_agg(l.line_text, chr(10)
                                  ORDER BY l.line_no, l.line_text)) AS ctx
      FROM (
        SELECT t.name AS dname, t.fqn AS dfqn, t.definition_type AS dtype,
               t.primary_file_path AS dpath, t.start_line AS ds, t.end_line AS de,
               COALESCE(r.source_start_line, t.start_line) AS rs,
               COALESCE(r.source_end_line, t.end_line) AS re,
               r.type AS rtype
        FROM definition_relationships r
        JOIN definition_nodes s
          ON s.id = r.target_id AND r.target_table = 'definition_nodes'
         AND s.name = ({name_sql})
         AND s.primary_file_path = ({path_sql})
        JOIN definition_nodes t ON t.id = r.source_id
        WHERE r.type IN ('CALLS','AMBIGUOUSLY_CALLS','PROPERTY_REFERENCE')
        ORDER BY dfqn, ds, rs, re, rtype
        LIMIT {page_size} OFFSET {(page - 1) * page_size}
      ) h
      LEFT JOIN file_lines l
        ON l.path = h.dpath
       AND l.line_no BETWEEN greatest(h.rs - 2, h.ds) AND least(h.re + 2, h.de)
      GROUP BY h.dname, h.dfqn, h.dtype, h.dpath, h.ds, h.de, h.rs, h.re, h.rtype
    ) p
    GROUP BY 1, 2, 3, 4, 5, 6
  ) g
) a
"""


# ---------------------------------------------------------------------------
# read_definitions XML shaping (crates/mcp/src/tools/read_definitions)
# ---------------------------------------------------------------------------

READ_DEFS_FOUND_FRAMEWORK = (
    "\nDecision Framework:\n"
    "  - If your current task is to understand specific definitions, you can use the returned definition bodies directly.\n"
    "  - If you need to find references to these definitions, use the `get_references` tool with the definition names and file paths.\n"
    "  - If you need to find related definitions or explore the codebase further, use the `search_codebase_definitions` tool.\n"
)
READ_DEFS_EMPTY_FRAMEWORK = (
    "No definitions were found for the requested names and file paths.\n"
    "\nDecision Framework:\n"
    "  - Verify that the definition names and file paths are correct and exact matches.\n"
    "  - Use the `search_codebase_definitions` tool to find definitions with similar names.\n"
    "  - If you know the definitions exist, use the `index_project` tool to re-index the project and try again.\n"
    "  - If you know the definitions exist, and the indexing is up to date, you can stop using the Knowledge Graph for the missing definitions.\n"
)

#: Per-definition fragment (read_definitions/output.rs:28-43).
_READ_DEF_FMT = (
    "    <definition>\n"
    "      <name>%s</name>\n"
    "      <fqn>%s</fqn>\n"
    "      <definition-type>%s</definition-type>\n"
    "      <location>%s:L%d-%d</location>\n"
    "      <definition-body>\n%s\n      </definition-body>\n"
    "    </definition>"
)


def read_definitions_xml(
    kg: KnowledgeGraph, requests: list[tuple[str, str]], limit: int = 100
) -> DataFrame:
    """The read_definitions MCP tool's full render (read_definitions/
    service.rs:26-98, output.rs:28-50): each requested (name, file) pair's
    definitions with their FULL SOURCE BODY — the definition's line span
    from the indexed line inventory, trimmed — plus the processed/found/
    read summary and decision framework. One row
    ``(xml, n_results, system_message)``."""
    from knowledge_graph_spark.queries.library import _context_lines, read_definitions

    hits = read_definitions(kg, requests, limit=limit)
    lines = _context_lines(kg)
    j = F.broadcast(hits).join(
        lines,
        (hits.primary_file_path == lines._path)
        & (lines._line >= hits.start_line)
        & (lines._line <= hits.end_line),
    )
    body = F.trim(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_line", "_rendered"))),
                lambda s: s["_rendered"],
            ),
            "\n",
        )
    )
    keys = [
        "name", "fqn", "definition_type", "primary_file_path", "start_line", "end_line",
    ]
    snips = j.groupBy(*keys).agg(body.alias("body"))
    per_def = hits.join(F.broadcast(snips), keys, "left")
    frag = F.format_string(
        _READ_DEF_FMT,
        xml_escape(F.col("name")),
        xml_escape(F.col("fqn")),
        xml_escape(F.col("definition_type")),
        xml_escape(F.col("primary_file_path")),
        F.col("start_line") + 1,
        F.col("end_line") + 1,
        xml_escape(F.coalesce(F.col("body"), F.lit(""))),
    )
    agg = per_def.withColumn("frag", frag).groupBy().agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("fqn", "start_line", "frag"))),
                lambda s: s["frag"],
            ),
            "\n",
        ).alias("defs_xml"),
        F.count(F.lit(1)).alias("n_results"),
    )
    n = F.coalesce(F.col("n_results"), F.lit(0))
    n_requested = len(list(dict.fromkeys(requests)))
    found_msg = F.format_string(
        "Processed %d definition requests, found %d definitions.\n"
        "Successfully read %d definition bodies, 0 had errors.\n"
        + READ_DEFS_FOUND_FRAMEWORK.replace("%", "%%"),
        F.lit(n_requested),
        n,
        n,
    )
    empty_msg = F.lit(
        f"Processed {n_requested} definition requests, found 0 definitions.\n"
        + READ_DEFS_EMPTY_FRAMEWORK
    )
    system_message = F.when(n > 0, found_msg).otherwise(empty_msg)
    xml = F.concat(
        F.lit("<ToolResponse>\n  <definitions>\n"),
        F.when(n > 0, F.concat(F.col("defs_xml"), F.lit("\n"))).otherwise(F.lit("")),
        F.lit("  </definitions>\n  <system-message>\n"),
        system_message,
        F.lit("  </system-message>\n</ToolResponse>"),
    )
    return agg.select(
        xml.alias("xml"),
        n.cast("long").alias("n_results"),
        system_message.alias("system_message"),
    )


def read_definitions_xml_sql(requests_sql: str, n_requested_sql: str, limit: int) -> str:
    """Oracle twin of read_definitions_xml. ``requests_sql`` yields
    (name, primary_file_path) request rows; ``n_requested_sql`` a scalar
    expression for the request count."""

    def sq(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    frag = (
        "printf(" + sq(_READ_DEF_FMT) + ", "
        + _xml_esc_sql("p.name") + ", "
        + _xml_esc_sql("p.fqn") + ", "
        + _xml_esc_sql("p.definition_type") + ", "
        + _xml_esc_sql("p.primary_file_path")
        + ", p.start_line + 1, p.end_line + 1, "
        + _xml_esc_sql("coalesce(p.body, '')") + ")"
    )
    found_msg = (
        f"printf('Processed %d definition requests, found %d definitions.' || chr(10) || "
        f"'Successfully read %d definition bodies, 0 had errors.' || chr(10) || "
        f"{sq(READ_DEFS_FOUND_FRAMEWORK)}, ({n_requested_sql}), a.n_results, a.n_results)"
    )
    empty_msg = (
        f"printf('Processed %d definition requests, found 0 definitions.' || chr(10) || "
        f"{sq(READ_DEFS_EMPTY_FRAMEWORK)}, ({n_requested_sql}))"
    )
    sysmsg = f"CASE WHEN a.n_results > 0 THEN {found_msg} ELSE {empty_msg} END"
    return f"""
SELECT
  '<ToolResponse>' || chr(10) || '  <definitions>' || chr(10)
    || CASE WHEN a.n_results > 0 THEN a.defs_xml || chr(10) ELSE '' END
    || '  </definitions>' || chr(10) || '  <system-message>' || chr(10)
    || {sysmsg}
    || '  </system-message>' || chr(10) || '</ToolResponse>' AS xml,
  CAST(a.n_results AS BIGINT) AS n_results,
  {sysmsg} AS system_message
FROM (
  SELECT coalesce(string_agg({frag}, chr(10) ORDER BY p.fqn, p.start_line), '') AS defs_xml,
         CAST(count(*) AS BIGINT) AS n_results
  FROM (
    SELECT h.name, h.fqn, h.definition_type, h.primary_file_path,
           h.start_line, h.end_line,
           trim(string_agg(l.line_text, chr(10)
                           ORDER BY l.line_no, l.line_text)) AS body
    FROM (
      SELECT d.name, d.fqn, d.definition_type, d.primary_file_path,
             d.start_line, d.end_line
      FROM definition_nodes d
      JOIN ({requests_sql}) q
        ON q.name = d.name AND q.primary_file_path = d.primary_file_path
      ORDER BY d.primary_file_path, d.start_line, d.name, d.fqn
      LIMIT {limit}
    ) h
    LEFT JOIN file_lines l
      ON l.path = h.primary_file_path
     AND l.line_no BETWEEN h.start_line AND h.end_line
    GROUP BY 1, 2, 3, 4, 5, 6
  ) p
) a
"""


# ---------------------------------------------------------------------------
# get_definition XML shaping (crates/mcp/src/tools/get_definition)
# ---------------------------------------------------------------------------

#: Per-hit fragment (get_definition/output.rs:54-106): raw 0-based db lines,
#: edge col interval, boolean flag, CDATA code span.
_GETDEF_FMT = (
    "    <definition>\n"
    "      <type>%s</type>\n"
    "      <id>%d</id>\n"
    "      <name>%s</name>\n"
    "      <fqn>%s</fqn>\n"
    "      <primary-file-path>%s</primary-file-path>\n"
    "      <absolute-file-path>%s</absolute-file-path>\n"
    "      <start-line>%d</start-line>\n"
    "      <end-line>%d</end-line>\n"
    "      <rel-start-col>%d</rel-start-col>\n"
    "      <rel-end-col>%d</rel-end-col>\n"
    "      <is-ambiguous>%s</is-ambiguous>\n"
    "      <code>\n%s\n      </code>\n"
    "    </definition>"
)


def get_definition_xml(
    kg: KnowledgeGraph,
    file_path: str,
    line_content: str,
    symbol_name: str,
    project_path: str = "/repo",
) -> DataFrame:
    """The get_definition MCP tool's full render (get_definition/service.rs:
    30-228, output.rs:54-106): find the source lines matching
    ``line_content`` (trim-equality, find_matching_line_numbers), locate
    every occurrence of ``symbol_name`` on them, resolve each occurrence
    through the call-site column intervals on CALLS/AMBIGUOUSLY_CALLS
    edges, dedupe (definitions by id; imported symbols keep the narrowest
    column interval per id, select_best_hits), and render each hit with its
    code span. One row ``(xml, n_results, system_message)``.

    Deviations, documented: occurrence scanning finds overlapping
    occurrences (the reference skips past each match); the reference's
    HashMap ordering is replaced by (type, fqn, start-line, id) ordering in
    both engines; system_message is '' instead of absent (the oracle
    comparator treats NULL == NULL but the two flag sentences match)."""
    from knowledge_graph_spark.queries.library import _context_lines

    lines = _context_lines(kg)
    sym_len = len(symbol_name)
    matched = lines.filter(
        (F.col("_path") == file_path)
        & (F.trim(F.col("_rendered")) == line_content.strip())
    ).select(F.col("_line").alias("m_line"), F.col("_rendered").alias("m_text"))
    # all 0-based occurrence columns of the symbol on each matched line
    occ = matched.select(
        "m_line",
        F.explode(
            F.transform(
                F.filter(
                    F.sequence(F.lit(1), F.greatest(F.length("m_text") - (sym_len - 1), F.lit(1))),
                    lambda i: F.col("m_text").substr(i, F.lit(sym_len))
                    == F.lit(symbol_name),
                ),
                lambda i: i - 1,
            )
        ).alias("occ_col"),
    )
    n_lines = matched.count()
    n_occ = occ.count()

    src = kg.definitions.filter(F.col("primary_file_path") == file_path).select(
        F.col("id").alias("_sid")
    )
    edges = (
        kg.edges["definition_relationships"]
        .filter(F.col("type").isin(["CALLS", "AMBIGUOUSLY_CALLS"]))
        .alias("r")
        .join(F.broadcast(src), F.col("r.source_id") == F.col("_sid"))
        .join(
            F.broadcast(occ),
            (F.col("r.source_start_line") == F.col("m_line"))
            & (F.col("r.source_start_col") <= F.col("occ_col"))
            & (F.col("r.source_end_col") >= F.col("occ_col") + sym_len - 1),
        )
    )
    # `edges` is bounded by the matched symbol occurrences (already the
    # result of two broadcast joins) — hint it so the node-table lookups
    # stay BroadcastHashJoins whatever the cache/statistics state (r9)
    defs_hits = (
        F.broadcast(edges.filter(F.col("r.target_table") == "definition_nodes"))
        .join(kg.definitions.alias("t"), F.col("r.target_id") == F.col("t.id"))
        .filter(F.lower(F.col("t.name")) == symbol_name.lower())
        .select(
            F.lit("Definition").alias("ttype"),
            F.col("t.id").alias("tid"),
            F.col("t.name").alias("tname"),
            F.col("t.fqn").alias("tfqn"),
            F.col("t.primary_file_path").alias("tpath"),
            F.col("t.start_line").alias("ts"),
            F.col("t.end_line").alias("te"),
            F.col("r.source_start_col").alias("c0"),
            F.col("r.source_end_col").alias("c1"),
            (F.col("r.type") == "AMBIGUOUSLY_CALLS").alias("amb"),
        )
        # no distinct: the best-hit window below keeps exactly one row per
        # tid anyway, and duplicate rows cannot change the rn=1 winner
    )
    imp_hits = (
        F.broadcast(edges.filter(F.col("r.target_table") == "imported_symbol_nodes"))
        .join(kg.imports.alias("i"), F.col("r.target_id") == F.col("i.id"))
        .select(
            F.lit("ImportedSymbol").alias("ttype"),
            F.col("i.id").alias("tid"),
            F.coalesce(F.col("i.name"), F.lit("")).alias("tname"),
            F.lit("").alias("tfqn"),
            F.col("i.file_path").alias("tpath"),
            F.col("i.start_line").alias("ts"),
            F.col("i.end_line").alias("te"),
            F.col("r.source_start_col").alias("c0"),
            F.col("r.source_end_col").alias("c1"),
            (F.col("r.type") == "AMBIGUOUSLY_CALLS").alias("amb"),
        )
    )
    # select_best_hits: defs dedupe by id picking the (c0, c1, amb)-first
    # row; imports keep the NARROWEST column interval per id
    # (service.rs:256-283). ONE window over the tagged union — within a
    # (ttype, tid) partition the type is constant, so conditional order
    # keys reproduce both orderings with a single exchange instead of two
    from pyspark.sql import Window

    _is_imp = F.col("ttype") == "ImportedSymbol"
    wbest = Window.partitionBy("ttype", "tid").orderBy(
        F.when(_is_imp, F.col("c1") - F.col("c0")).otherwise(F.col("c0")),
        F.when(_is_imp, F.col("c0")).otherwise(F.col("c1")),
        "amb",
    )
    hits = (
        defs_hits.unionByName(imp_hits)
        .withColumn("_rn", F.row_number().over(wbest))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    j = F.broadcast(hits).join(
        lines,
        (hits.tpath == lines._path)
        & (lines._line >= hits.ts)
        & (lines._line <= hits.te),
    )
    code = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_line", "_rendered"))),
            lambda s: s["_rendered"],
        ),
        "\n",
    )
    keys = ["ttype", "tid", "tname", "tfqn", "tpath", "ts", "te", "c0", "c1", "amb"]
    snips = j.groupBy(*keys).agg(code.alias("code"))
    per_hit = hits.join(F.broadcast(snips), keys, "left")
    frag = F.format_string(
        _GETDEF_FMT,
        F.col("ttype"),
        F.col("tid"),
        xml_escape(F.col("tname")),
        xml_escape(F.col("tfqn")),
        xml_escape(F.col("tpath")),
        xml_escape(F.concat(F.lit(project_path + "/"), F.col("tpath"))),
        F.col("ts"),
        F.col("te"),
        F.col("c0"),
        F.col("c1"),
        F.when(F.col("amb"), F.lit("true")).otherwise(F.lit("false")),
        xml_escape(F.coalesce(F.col("code"), F.lit(""))),
    )
    agg = per_hit.withColumn("frag", frag).groupBy().agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ttype", "tfqn", "ts", "tid", "frag"))
                ),
                lambda s: s["frag"],
            ),
            "\n",
        ).alias("defs_xml"),
        F.count(F.lit(1)).alias("n_results"),
    )
    n = F.coalesce(F.col("n_results"), F.lit(0))
    parts = []
    if n_lines > 1:
        parts.append(f"Multiple lines matched this code ({n_lines}).")
    if n_occ > n_lines:
        parts.append("Multiple occurrences of the symbol on the line.")
    system_message = F.lit(" ".join(parts))
    xml = F.concat(
        F.lit("<ToolResponse>\n  <definitions>\n"),
        F.when(n > 0, F.concat(F.col("defs_xml"), F.lit("\n"))).otherwise(F.lit("")),
        F.lit("  </definitions>\n"),
        F.when(
            F.length(system_message) > 0,
            F.concat(
                F.lit("  <system-message>\n"),
                system_message,
                F.lit("\n  </system-message>\n"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</ToolResponse>"),
    )
    return agg.select(
        xml.alias("xml"),
        n.cast("long").alias("n_results"),
        system_message.alias("system_message"),
    )


def get_definition_xml_sql(
    fp_sql: str, ln_sql: str, sym_sql: str, project_path: str = "/repo"
) -> tuple[str, str]:
    """Oracle twin of get_definition_xml, returned as (extra_ctes,
    select_sql) for the graph-CTE wrapper. ``fp_sql``/``ln_sql``/``sym_sql``
    are scalar expressions for the probe file path, the probed source line
    number (whose text becomes the line_content input), and the symbol."""

    def sq(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    frag = (
        "printf(" + sq(_GETDEF_FMT) + ", p.ttype, p.tid, "
        + _xml_esc_sql("p.tname") + ", "
        + _xml_esc_sql("p.tfqn") + ", "
        + _xml_esc_sql("p.tpath") + ", "
        + _xml_esc_sql(f"'{project_path}/' || p.tpath")
        + ", p.ts, p.te, p.c0, p.c1, CASE WHEN p.amb THEN 'true' ELSE 'false' END, "
        + _xml_esc_sql("coalesce(p.code, '')") + ")"
    )
    ctes = f"""gd_params AS (
  SELECT ({fp_sql}) AS fp, ({ln_sql}) AS ln, ({sym_sql}) AS sym
),
gd_line AS (
  SELECT trim(l.line_text) AS content
  FROM file_lines l, gd_params p
  WHERE l.path = p.fp AND l.line_no = p.ln
  ORDER BY l.line_text LIMIT 1
),
mline AS (
  SELECT l.line_no AS m_line, l.line_text AS m_text
  FROM file_lines l, gd_params p
  WHERE l.path = p.fp AND trim(l.line_text) = (SELECT content FROM gd_line)
),
occ AS (
  SELECT m.m_line, u.i - 1 AS occ_col
  FROM mline m,
       LATERAL unnest(range(1, greatest(length(m.m_text)
             - ((SELECT length(sym) FROM gd_params) - 1), 1) + 1)) u(i)
  WHERE substr(m.m_text, CAST(u.i AS INT),
               CAST((SELECT length(sym) FROM gd_params) AS INT))
        = (SELECT sym FROM gd_params)
),
gd_edges AS (
  SELECT r.target_table, r.target_id, r.source_start_col, r.source_end_col, r.type
  FROM definition_relationships r
  JOIN definition_nodes s
    ON s.id = r.source_id AND s.primary_file_path = (SELECT fp FROM gd_params)
  JOIN occ o ON r.source_start_line = o.m_line
   AND r.source_start_col <= o.occ_col
   AND r.source_end_col >= o.occ_col + (SELECT length(sym) FROM gd_params) - 1
  WHERE r.type IN ('CALLS','AMBIGUOUSLY_CALLS')
),
gd_hits AS (
  SELECT * FROM (
    SELECT d.*, row_number() OVER (PARTITION BY d.tid ORDER BY d.c0, d.c1, d.amb) AS rn
    FROM (
      SELECT DISTINCT 'Definition' AS ttype, t.id AS tid, t.name AS tname,
             t.fqn AS tfqn, t.primary_file_path AS tpath,
             t.start_line AS ts, t.end_line AS te,
             e.source_start_col AS c0, e.source_end_col AS c1,
             e.type = 'AMBIGUOUSLY_CALLS' AS amb
      FROM gd_edges e
      JOIN definition_nodes t
        ON t.id = e.target_id AND e.target_table = 'definition_nodes'
      WHERE lower(t.name) = lower((SELECT sym FROM gd_params))
    ) d
  ) WHERE rn = 1
  UNION ALL
  SELECT * FROM (
    SELECT i.*, row_number() OVER (PARTITION BY i.tid
                                   ORDER BY i.c1 - i.c0, i.c0, i.amb) AS rn
    FROM (
      SELECT 'ImportedSymbol' AS ttype, t.id AS tid,
             coalesce(t.name, '') AS tname, '' AS tfqn, t.file_path AS tpath,
             t.start_line AS ts, t.end_line AS te,
             e.source_start_col AS c0, e.source_end_col AS c1,
             e.type = 'AMBIGUOUSLY_CALLS' AS amb
      FROM gd_edges e
      JOIN imported_symbol_nodes t
        ON t.id = e.target_id AND e.target_table = 'imported_symbol_nodes'
    ) i
  ) WHERE rn = 1
),
gd_coded AS (
  SELECT h.ttype, h.tid, h.tname, h.tfqn, h.tpath, h.ts, h.te, h.c0, h.c1, h.amb,
         string_agg(l.line_text, chr(10) ORDER BY l.line_no, l.line_text) AS code
  FROM gd_hits h
  LEFT JOIN file_lines l
    ON l.path = h.tpath AND l.line_no BETWEEN h.ts AND h.te
  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10
),
gd_agg AS (
  SELECT coalesce(string_agg({frag}, chr(10)
                  ORDER BY p.ttype, p.tfqn, p.ts, p.tid), '') AS defs_xml,
         CAST(count(*) AS BIGINT) AS n_results
  FROM gd_coded p
),
gd_msg AS (
  SELECT coalesce(concat_ws(' ',
    CASE WHEN (SELECT count(*) FROM mline) > 1
         THEN printf('Multiple lines matched this code (%d).',
                     (SELECT count(*) FROM mline)) END,
    CASE WHEN (SELECT count(*) FROM occ) > (SELECT count(*) FROM mline)
         THEN 'Multiple occurrences of the symbol on the line.' END), '') AS msg
)"""
    select = f"""
SELECT
  '<ToolResponse>' || chr(10) || '  <definitions>' || chr(10)
    || CASE WHEN a.n_results > 0 THEN a.defs_xml || chr(10) ELSE '' END
    || '  </definitions>' || chr(10)
    || CASE WHEN length(m.msg) > 0
            THEN '  <system-message>' || chr(10) || m.msg || chr(10)
                 || '  </system-message>' || chr(10)
            ELSE '' END
    || '</ToolResponse>' AS xml,
  a.n_results,
  m.msg AS system_message
FROM gd_agg a, gd_msg m
"""
    return ctes, select


def xml_export(kg: KnowledgeGraph, context_lines: int = 2) -> DataFrame:
    """Corpus-wide formatted export: EVERY definition's XML fragment with
    its context snippet, as a (primary_file_path, fqn, start_line, fragment)
    frame — the distributed form of the search render (no page SELECT, no
    global 1-row aggregation), so callers can write it partitioned by file
    path like any other table. The per-fragment bytes are identical to
    search_definitions_xml's <definition> elements for the same rows."""
    from knowledge_graph_spark.queries.library import _context_lines

    ctx = int(context_lines)
    lines = _context_lines(kg)
    defs = kg.definitions.select(
        "fqn", "name", "definition_type", "primary_file_path",
        "start_line", "end_line",
    )
    j = defs.join(
        lines,
        (defs.primary_file_path == lines._path)
        & (lines._line >= defs.start_line - ctx)
        & (lines._line <= defs.start_line + ctx),
    )
    snippet = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_line", "_rendered"))),
            lambda s: s["_rendered"],
        ),
        "\n",
    )
    enriched = j.groupBy(
        "fqn", "name", "definition_type", "primary_file_path",
        "start_line", "end_line",
    ).agg(snippet.alias("snippet"))
    frag = F.format_string(
        _FRAG_FMT,
        xml_escape(F.col("name")),
        xml_escape(F.col("fqn")),
        xml_escape(F.col("definition_type")),
        xml_escape(F.col("primary_file_path")),
        F.col("start_line"),
        F.col("end_line"),
        xml_escape(F.col("snippet")),
    )
    return enriched.select(
        "primary_file_path", "fqn", "start_line", frag.alias("fragment")
    )


# ---------------------------------------------------------------------------
# repo_map XML shaping (crates/mcp/src/tools/repo_map)
# ---------------------------------------------------------------------------

_REPO_MAP_FILE_FMT = (
    "      <file>\n"
    "        <path>%s</path>\n"
    "        <definitions>\n%s        </definitions>\n"
    "      </file>"
)


def repo_map_xml(
    kg: KnowledgeGraph,
    depth: int = 2,
    page: int = 1,
    page_size: int = 200,
    show_directories: bool = True,
    show_definitions: bool = True,
) -> DataFrame:
    """The repo_map MCP tool's full render (repo_map/tool.rs:100-240,
    output.rs:14-148): an ASCII directory tree to ``depth`` plus per-file
    definition blocks — ``{type} {fqn} L{s}-{e}`` headers with the first
    three source lines of each span, deduplicated per file so overlapping
    definitions never reprint a line — paged over definitions ordered by
    (file, start_line). One row ``(xml, next_page, n_results,
    system_message)``.

    Depth semantics mirror the walker (repository.rs:52-60): directories to
    ``depth`` segments, files one level deeper. The tree renders in sorted
    path order, which equals the reference's BTreeMap DFS for alphanumeric
    directory names. Everything is DataFrame expressions — the tree's
    connector prefixes come from an ancestor-flag join, not a driver loop.
    """
    from pyspark.sql import Window

    from knowledge_graph_spark.queries.library import _context_lines

    segs = F.split(F.col("path"), "/")
    files = kg.files.filter(F.size(F.split(F.col("path"), "/")) <= depth + 1).select(
        F.col("path").alias("fpath")
    )

    # -- definitions page ----------------------------------------------------
    # pinned (eager localCheckpoint of ≤ page_size rows): the paged frame
    # feeds BOTH the snippet range-join and the per-def assembly join —
    # un-pinned, each consumer re-ran the full definitions sort+page (the
    # query's single biggest subtree) once (r8 optimization, guide §1.2)
    from knowledge_graph_spark.persist import pin_small

    defs = pin_small(
        kg.definitions.join(
            F.broadcast(files), kg.definitions.primary_file_path == files.fpath
        )
        .select(
            "fqn", "definition_type",
            F.col("primary_file_path").alias("file_rel"),
            "start_line", "end_line",
        )
        .orderBy("file_rel", "start_line", "fqn")
        .offset((page - 1) * page_size)
        .limit(page_size)
    )
    lines = _context_lines(kg)
    dj = F.broadcast(defs).join(
        lines,
        (defs.file_rel == lines._path)
        & (lines._line >= defs.start_line)
        & (lines._line <= F.least(defs.start_line + 2, defs.end_line)),
    )
    # first-writer-wins per (file, source line): the def earliest in the
    # sorted block keeps the line (output.rs printed_lines HashSet)
    wline = Window.partitionBy("file_rel", "_line").orderBy("start_line", "fqn")
    kept = (
        dj.withColumn("_rn", F.row_number().over(wline))
        .filter(F.col("_rn") == 1)
        .groupBy("file_rel", "fqn", "definition_type", "start_line", "end_line")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_line", "_rendered"))),
                    lambda s: F.concat(F.lit("│ "), s["_rendered"], F.lit("\n")),
                ),
                "",
            ).alias("snip")
        )
    )
    keys = ["file_rel", "fqn", "definition_type", "start_line", "end_line"]
    per_def = defs.join(F.broadcast(kept), keys, "left")
    entry = F.concat(
        F.format_string(
            "%s %s L%d-%d\n",
            F.lower(F.col("definition_type")),
            F.col("fqn"),
            F.col("start_line") + 1,
            F.col("end_line") + 1,
        ),
        F.coalesce(F.col("snip"), F.lit("")),
        F.lit("\n"),
    )
    per_file = (
        per_def.withColumn("entry", entry)
        .groupBy("file_rel")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("start_line", "fqn", "entry"))),
                    lambda s: s["entry"],
                ),
                "",
            ).alias("defs_text"),
            F.count(F.lit(1)).alias("n_defs"),
        )
    )
    fblock = F.format_string(
        _REPO_MAP_FILE_FMT, xml_escape(F.col("file_rel")), F.col("defs_text")
    )
    files_agg = per_file.withColumn("fb", fblock).groupBy().agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("file_rel", "fb"))),
                lambda s: s["fb"],
            ),
            "\n",
        ).alias("files_xml"),
        F.sum("n_defs").alias("n_results"),
    )

    # -- directory tree --------------------------------------------------
    dirs = (
        kg.nodes["directory_nodes"]
        .filter(F.size(segs) <= depth)
        .select(F.col("path").alias("dp"))
        .union(
            files.filter(F.col("fpath").contains("/")).select(
                F.regexp_replace("fpath", "/[^/]*$", "").alias("dp")
            )
        )
        .distinct()
    )
    dsegs = F.split(F.col("dp"), "/")
    nodes = (
        dirs.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(dsegs)),
                    lambda i: F.array_join(F.slice(dsegs, 1, i), "/"),
                )
            ).alias("np")
        )
        .distinct()
        .withColumn(
            "parent",
            F.when(
                F.col("np").contains("/"), F.regexp_replace("np", "/[^/]*$", "")
            ).otherwise(F.lit("")),
        )
        .withColumn("name", F.element_at(F.split("np", "/"), -1))
    )
    last = nodes.groupBy("parent").agg(F.max("name").alias("_maxname"))
    flagged = nodes.join(F.broadcast(last), "parent").withColumn(
        "is_last", F.col("name") == F.col("_maxname")
    )
    nsegs = F.split(F.col("np"), "/")
    anc = flagged.select(
        "np",
        F.explode(
            F.when(
                F.size(nsegs) > 1,
                F.transform(
                    F.sequence(F.lit(1), F.size(nsegs) - 1),
                    lambda i: F.array_join(F.slice(nsegs, 1, i), "/"),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("ap"),
    )
    anc_flags = anc.join(
        F.broadcast(flagged.select(F.col("np").alias("ap"), "is_last")), "ap"
    )
    prefixes = anc_flags.groupBy("np").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.length("ap").alias("l"), "is_last"))
                ),
                lambda s: F.when(s["is_last"], F.lit("    ")).otherwise(F.lit("│   ")),
            ),
            "",
        ).alias("pfx")
    )
    tree_line = F.concat(
        F.coalesce(F.col("pfx"), F.lit("")),
        F.when(F.col("is_last"), F.lit("└── ")).otherwise(F.lit("├── ")),
        F.col("name"),
        F.lit("\n"),
    )
    tree_agg = (
        flagged.join(F.broadcast(prefixes), "np", "left")
        .withColumn("tl", tree_line)
        .groupBy()
        .agg(
            F.concat(
                F.lit(".\n"),
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("np", "tl"))),
                        lambda s: s["tl"],
                    ),
                    "",
                ),
            ).alias("dirs_text")
        )
    )

    agg = files_agg.crossJoin(tree_agg)
    n = F.coalesce(F.col("n_results"), F.lit(0))
    next_page = F.when(n == page_size, F.lit(page + 1).cast("long")).otherwise(
        F.lit(None).cast("long")
    )
    system_message = F.format_string(
        "Returned %d definitions from 1 input path(s). depth=%d.%s",
        n,
        F.lit(depth),
        F.when(
            next_page.isNotNull(), F.lit(" More results available via next-page.")
        ).otherwise(F.lit("")),
    )
    xml = F.concat(
        F.lit("<ToolResponse>\n  <repo-map>\n"),
        F.format_string("    <depth>%d</depth>\n", F.lit(depth)),
        (
            F.concat(
                F.lit("    <directories>\n"),
                F.coalesce(F.col("dirs_text"), F.lit(".\n")),
                F.lit("    </directories>\n"),
            )
            if show_directories
            else F.lit("")
        ),
        (
            F.concat(
                F.lit("    <files>\n"),
                F.when(n > 0, F.concat(F.col("files_xml"), F.lit("\n"))).otherwise(
                    F.lit("")
                ),
                F.lit("    </files>\n"),
            )
            if show_definitions
            else F.lit("")
        ),
        F.lit("  </repo-map>\n"),
        F.when(
            next_page.isNotNull(),
            F.format_string("  <next-page>%d</next-page>\n", next_page),
        ).otherwise(F.lit("")),
        F.lit("  <system-message>\n"),
        system_message,
        F.lit("\n  </system-message>\n</ToolResponse>"),
    )
    return agg.select(
        xml.alias("xml"),
        next_page.alias("next_page"),
        n.cast("long").alias("n_results"),
        system_message.alias("system_message"),
    )
