"""DuckDB reconstruction of the docs_adapter page/extraction surface.

The corpus generator (sources/docs_adapter.py) renders every page as a
pure md5-arithmetic function of ``documents.doc_id`` — no ``random``
draws anywhere on the queries() path — so the rendered URL, the frozen
extractor's text column, and the pre-dedup entity fields all have exact
ANSI-SQL equivalents. This converts the KG family's extraction surface
from rows-only checks into full value-hash oracle checks (VERDICT r4,
"Next round" #3).

The CTE chain mirrors the generator step by step:
  pools   — the literal _NOUNS/_QUALS/_AUTHORS/_VERBS/_LANGS tables
  base    — _page_for_doc's branch select (%7 exact dup of the previous
            entity, %11 fuzzy "+x" variant, else self)
  ent     — entity_from_index's md5 draws (hot author, style, has_repo)
  named   — name-style and description templates
  page    — per-page name/repo/registry resolution
  rendered— _render_html ∘ extract_text composed symbolically: the
            extractor emits each character-data run stripped, joined
            with "\\n"  (title, h1, first <p>, anchor text, tag spans,
            tool <li>s), which for the generated HTML is
            title \\n title \\n desc [\\n GitHub] \\n #noun \\n qual
            [\\n tool...]

Any edit to docs_adapter.entity_from_index/_page_for_doc or to
synth._render_html MUST be mirrored here (tests/test_parity.py and
tools/check_correctness.py both fail loudly if they drift).
"""

ENTITY_CTE = """
pools AS (SELECT
  ['postgres','redis','filesystem','webhook','graphql','slack','metrics',
   'search','neural','cloud','oauth','storage','git','analytics','discord',
   'elasticsearch','kubernetes','logging','email','jwt','mongodb','etl',
   'aws','notify','index'] AS nouns,
  ['fast','simple','secure','smart','tiny','turbo','hyper','open','core',
   'plus','pro','lite','max','zen','nova'] AS quals,
  ['alice','bob','carol','dmitri','elena','fawzi','grace','hiro','imani',
   'jorge','kavya','liang'] AS authors,
  ['get','list','create','update','query','search','run','fetch'] AS verbs,
  ['python','typescript','go','rust'] AS langs,
  ['github-pages.example','mcp-so.example','glama.example',
   'mcpmarket.example'] AS domains,
  ['github','mcp.so','glama','mcpmarket.com'] AS regs,
  ['github','mcp_so','glama','mcp_market'] AS prefixes),
base AS (
  SELECT doc_id,
    CASE WHEN doc_id > 0 AND (doc_id % 7 = 0 OR doc_id % 11 = 0)
         THEN doc_id - 1 ELSE doc_id END AS idx,
    (doc_id > 0 AND doc_id % 7 = 0) AS is7,
    (doc_id > 0 AND doc_id % 7 <> 0 AND doc_id % 11 = 0) AS is11
  FROM documents),
ent AS (
  SELECT b.*,
    p.nouns[(idx % 25) + 1] AS noun,
    p.quals[((idx // 25) % 15) + 1] AS qual,
    p.nouns[((idx * 7 + 3) % 25) + 1] AS n2,
    p.langs[(idx % 4) + 1] AS lang,
    (idx * 131) % 5000 AS popularity,
    CASE WHEN ('0x' || substr(md5(CAST(idx AS VARCHAR)), 1, 8))::BIGINT % 10 < 2
         THEN p.authors[1]
         ELSE p.authors[(('0x' || substr(md5(CAST(idx AS VARCHAR)), 9, 8))::BIGINT % 12) + 1]
    END AS author,
    ('0x' || substr(md5(CAST(idx AS VARCHAR)), 17, 4))::BIGINT % 10 AS style,
    ('0x' || substr(md5(CAST(idx AS VARCHAR)), 21, 4))::BIGINT % 10 < 8 AS has_repo
  FROM base b, pools p),
named AS (
  SELECT e.*,
    CASE WHEN style < 3 THEN 'mcp-' || qual || '-' || noun || '-' || (idx % 97)
         WHEN style < 6 THEN qual || '-' || noun || '-' || (idx % 97) || '-server'
         ELSE qual || ' ' || noun || ' ' || (idx % 97) END AS name0,
    CASE idx % 4
      WHEN 0 THEN 'A ' || qual || ' MCP server for ' || noun || ' data access and ' || n2 || ' integration.'
      WHEN 1 THEN 'Provides ' || noun || ' tools with ' || qual || ' ' || n2 || ' processing and api support.'
      WHEN 2 THEN qual || ' server exposing ' || noun || ' resources over an http api for ' || n2 || '.'
      ELSE 'Connect your agent to ' || noun || ' with ' || qual || ' search and ' || n2 || ' sync.'
    END AS description
  FROM ent e),
page AS (
  SELECT n.*,
    CASE WHEN is11 THEN name0 || 'x' ELSE name0 END AS name,
    CASE WHEN is11 THEN FALSE ELSE has_repo END AS repo_exists,
    CASE WHEN is11 THEN (doc_id + 2) % 4 ELSE doc_id % 4 END AS reg_idx,
    coalesce(array_to_string(
      [chr(10) || p.verbs[((idx + t) % 8) + 1] || '_' || noun || '_' || t
       FOR t IN range(idx % 4)], ''), '') AS tools_txt
  FROM named n, pools p),
rendered AS (
  SELECT doc_id, idx,
    'https://' || p.domains[reg_idx + 1] || '/server/'
      || lower(replace(name, ' ', '-')) || '/' || author AS url,
    (name || ' by ' || author) || chr(10)
      || (name || ' by ' || author) || chr(10)
      || description
      || CASE WHEN repo_exists THEN chr(10) || 'GitHub' ELSE '' END
      || chr(10) || '#' || noun || chr(10) || qual
      || tools_txt AS text,
    p.prefixes[reg_idx + 1] || '_'
      || replace(replace(lower(name), ' ', '_'), '-', '_') AS id,
    name, author, description,
    CASE WHEN repo_exists THEN 'https://github.com/' || author || '/'
         || lower(replace(name0, ' ', '-')) ELSE NULL END AS repository,
    lang AS implementation_language,
    popularity AS popularity_score,
    p.regs[reg_idx + 1] AS registry_source
  FROM page pg, pools p)
"""

KG_TEXTS_ORACLE_SQL = "WITH " + ENTITY_CTE + " SELECT url, text FROM rendered"

PAGE_REGISTRY_HIST_ORACLE_SQL = (
    "WITH " + ENTITY_CTE
    + ' SELECT registry_source, count(*) AS "count()" '
      "FROM rendered GROUP BY registry_source")

PAGE_LANGUAGE_HIST_ORACLE_SQL = (
    "WITH " + ENTITY_CTE
    + ' SELECT implementation_language, count(*) AS "count()" '
      "FROM rendered GROUP BY implementation_language")

ENTITY_FIELDS_ORACLE_SQL = (
    "WITH " + ENTITY_CTE
    + " SELECT url AS source_url, id, name, author, description, "
      "repository, implementation_language, popularity_score "
      "FROM rendered")
