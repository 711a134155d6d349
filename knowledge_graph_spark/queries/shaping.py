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
