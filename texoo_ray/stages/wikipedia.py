"""WikipediaIndex — page id/title/redirect/URI maps with the reference's
lookup semantics, as a broadcast-dict stage.

Mirrors texoo-retrieval/src/main/java/de/datexis/retrieval/preprocess/
WikipediaIndex.java:

- ``read_pages``       (:48-97): parse a MediaWiki ``page.sql`` dump —
  lines starting with ``INSERT INTO `page` VALUES`` hold ``(...),(...)``
  tuples; namespace-0 rows feed title->id, and non-redirect titles not
  ending in "(disambiguation)" feed id->title.
- ``read_redirects``   (:116-157): ``redirect.sql`` rows (source id,
  namespace, target title), namespace 0 only.
- ``read_id_mapping``  (:102-114): TSV of (page title or URL, URI) ->
  both URI directions, titles cleaned with cleanWikiPageTitle.
- ``get_id_for_title`` (:182-214): exact match, then first-char-uppercase
  retry, then redirect chase bounded at 32 hops with cyclic-redirect
  short-circuit; matched/unmatched counters.
- ``get_title_for_id`` / ``get_title_from_redirect`` / ``get_uri_for_title``
  / ``get_title_for_uri`` (:166-230), ``filter_pages`` (:236-270).

Ray shape: the index is the SMALL side — build once on the driver (or
one task), ``ray.put`` the instance, and resolve title columns inside
``map_batches`` via ``WikiLinkStage`` (one ``ray.get`` per actor in
``__init__``, never per batch). The corpus side streams."""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import pyarrow as pa

from .cdv import clean_wiki_page_title

_PAGE_LINE = "INSERT INTO `page` VALUES"
_REDIRECT_LINE = "INSERT INTO `redirect` VALUES"


def _split_sql_tuples(line: str, prefix: str) -> Iterable[List[Optional[str]]]:
    """Yield the value tuples of one mysqldump INSERT line as lists of
    raw fields (quotes stripped, ``\\``-escapes resolved, NULL -> None).

    Replaces the reference's commons-csv configuration
    (WikipediaIndex.java:50-59: quote=', escape=\\, null='NULL')."""
    body = line[len(prefix):].strip()
    if body.startswith("("):
        body = body[1:]
    if body.endswith(";"):
        body = body[:-1]
    if body.endswith(")"):
        body = body[:-1]
    fields: List[Optional[str]] = []
    buf: List[str] = []
    in_quote = False
    was_quoted = False
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if in_quote:
            if c == "\\" and i + 1 < n:
                buf.append(body[i + 1])
                i += 2
                continue
            if c == "'":
                if i + 1 < n and body[i + 1] == "'":  # CSV doubled-quote
                    buf.append("'")
                    i += 2
                    continue
                in_quote = False
            else:
                buf.append(c)
        elif c == "'":
            in_quote = True
            was_quoted = True
        elif c == ",":
            s = "".join(buf)
            fields.append(None if (not was_quoted and s == "NULL") else s)
            buf = []
            was_quoted = False
        elif c == ")" and i + 2 < n and body[i + 1] == "," and body[i + 2] == "(":
            s = "".join(buf)
            fields.append(None if (not was_quoted and s == "NULL") else s)
            yield fields
            fields, buf, was_quoted = [], [], False
            i += 3
            continue
        else:
            buf.append(c)
        i += 1
    s = "".join(buf)
    fields.append(None if (not was_quoted and s == "NULL") else s)
    yield fields


class WikipediaIndex:
    """In-memory id/title/redirect/URI maps (the broadcast small side)."""

    def __init__(self):
        self.page_titles: Dict[int, str] = {}  # id -> title, entities only
        self.page_index: Dict[str, int] = {}  # title -> id, incl. redirects
        self.page_redirects: Dict[int, str] = {}  # source id -> target title
        self.page_uris: Optional[Dict[str, str]] = None
        self.page_uris_reverse: Optional[Dict[str, str]] = None
        self.matched = 0
        self.unmatched = 0

    # -- builders ----------------------------------------------------------

    def read_pages(self, lines: Iterable[str]) -> None:
        """WikipediaIndex.readPages (:48-97). Fields: 0=id, 1=namespace,
        2=title, 5=is_redirect ('1')."""
        for line in lines:
            if not line.startswith(_PAGE_LINE):
                continue
            for row in _split_sql_tuples(line, _PAGE_LINE):
                if len(row) < 6:
                    continue
                try:
                    page_id = int(row[0] or "")
                    namespace = int(row[1] or "")
                except ValueError:
                    continue
                if namespace != 0:
                    continue
                title = row[2]
                is_redirect = row[5] == "1"
                if title is None:
                    title = "NULL"  # quoted null, WikipediaIndex.java:79-80
                if not is_redirect and not title.endswith("(disambiguation)"):
                    self.page_titles.setdefault(page_id, title)
                self.page_index.setdefault(title, page_id)

    def read_redirects(self, lines: Iterable[str]) -> None:
        """WikipediaIndex.readRedirects (:116-157). Fields: 0=source id,
        1=namespace, 2=target title."""
        for line in lines:
            if not line.startswith(_REDIRECT_LINE):
                continue
            for row in _split_sql_tuples(line, _REDIRECT_LINE):
                if len(row) < 3:
                    continue
                try:
                    source_id = int(row[0] or "")
                    namespace = int(row[1] or "")
                except ValueError:
                    continue
                if namespace == 0 and row[2] is not None:
                    self.page_redirects.setdefault(source_id, row[2])

    def read_id_mapping(self, lines: Iterable[str]) -> None:
        """WikipediaIndex.readIDMapping (:102-114): TSV title\\tURI."""
        self.page_uris = {}
        self.page_uris_reverse = {}
        for line in lines:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            title = clean_wiki_page_title(parts[0])
            self.page_uris[title] = parts[1]
            self.page_uris_reverse[parts[1]] = title

    def from_tables(
        self,
        pages: Optional[Sequence[Tuple[int, int, str, bool]]] = None,
        redirects: Optional[Sequence[Tuple[int, int, str]]] = None,
    ) -> "WikipediaIndex":
        """Engine-native builder (parquet-backed pages instead of SQL
        dumps): pages = (id, namespace, title, is_redirect)."""
        for page_id, namespace, title, is_redirect in pages or ():
            if namespace != 0:
                continue
            if not is_redirect and not title.endswith("(disambiguation)"):
                self.page_titles.setdefault(page_id, title)
            self.page_index.setdefault(title, page_id)
        for source_id, namespace, target in redirects or ():
            if namespace == 0:
                self.page_redirects.setdefault(source_id, target)
        return self

    # -- lookups -----------------------------------------------------------

    def count_pages(self) -> int:
        return len(self.page_titles)

    def get_title_for_id(self, page_id: int) -> Optional[str]:
        """:166-168 — no redirect resolution."""
        return self.page_titles.get(page_id)

    def get_id_for_title(self, requested_page: Optional[str]) -> Optional[int]:
        """:182-214 — exact, then first-char-uppercase retry, then bounded
        redirect chase with cyclic short-circuit."""
        if requested_page is None:
            return None
        redirected = requested_page
        redirects = 0
        while redirects < 32:
            page_id = self.page_index.get(redirected)
            if page_id is None and redirected:
                retry = redirected[0].upper() + redirected[1:]
                page_id = self.page_index.get(retry)
            if page_id is None:
                self.unmatched += 1
                return None
            if page_id in self.page_redirects:
                redirected = self.page_redirects[page_id]
                if redirected == requested_page:  # cyclic redirect
                    self.matched += 1
                    return page_id
            else:
                self.matched += 1
                return page_id
            redirects += 1
        return None

    def get_title_from_redirect(self, page_title: str) -> Optional[str]:
        """:173-177."""
        page_id = self.get_id_for_title(page_title)
        return None if page_id is None else self.get_title_for_id(page_id)

    def get_uri_for_title(self, requested_page: str) -> Optional[str]:
        """:219-222 — falls back to redirect-resolved title when no
        URI mapping is loaded."""
        if self.page_uris is None:
            return self.get_title_from_redirect(requested_page)
        return self.page_uris.get(requested_page)

    def get_title_for_uri(self, requested_uri: str) -> Optional[str]:
        """:227-230."""
        if self.page_uris_reverse is None:
            return None
        return self.page_uris_reverse.get(requested_uri)

    def get_stats(self) -> str:
        return "WikipediaIndex: %d matched, %d unmatched." % (
            self.matched,
            self.unmatched,
        )

    def filter_pages(self, pages: Sequence[str]) -> None:
        """:242-270 — prune the entity map to the given pages (redirects
        resolved; URI map extended with the redirect targets)."""
        pruned: Dict[int, str] = {}
        for page in pages:
            page = clean_wiki_page_title(page)
            page_id = self.page_index.get(page)
            if page_id is None:
                continue
            if page_id in self.page_redirects:
                redirect = self.get_title_from_redirect(page)
                if redirect is None:
                    continue
                rid = self.page_index.get(redirect)
                if rid is not None:
                    pruned.setdefault(rid, redirect)
                if self.page_uris is not None:
                    uri = self.page_uris.get(page)
                    if uri is not None:
                        self.page_uris.setdefault(redirect, uri)
            else:
                title = self.page_titles.get(page_id)
                if title is not None:
                    pruned.setdefault(page_id, title)
        self.page_titles = pruned


class WikiLinkStage:
    """Actor-pool stage: resolve a title column against a broadcast
    WikipediaIndex — attaches ``page_id`` (int64, -1 for unmatched) and
    ``resolved_title`` (redirects chased). The index ref is fetched once
    per actor."""

    def __init__(self, index_ref, title_col: str = "title"):
        import ray

        self.index: WikipediaIndex = (
            ray.get(index_ref) if not isinstance(index_ref, WikipediaIndex) else index_ref
        )
        self.title_col = title_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        titles = batch[self.title_col].to_pylist()
        ids: List[int] = []
        resolved: List[Optional[str]] = []
        for t in titles:
            page_id = self.index.get_id_for_title(t)
            if page_id is None:
                ids.append(-1)
                resolved.append(None)
            else:
                ids.append(page_id)
                resolved.append(self.index.get_title_for_id(page_id))
        batch = batch.append_column("page_id", pa.array(ids, pa.int64()))
        batch = batch.append_column("resolved_title", pa.array(resolved, pa.string()))
        return batch
