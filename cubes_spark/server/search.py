"""Member search backends for the ``/search`` endpoint.

Parity: /root/reference/cubes/server/blueprint.py:542-575 — the
reference delegates ``/search`` to a pluggable external engine
(``cubes_search.create_searcher(engine_name, browser=...)``).  Here
the same delegation shape runs through the ExtensionFinder: the
``searcher`` extension type (``cubes_spark.searcher`` entry-point
group) with ``simple`` as the built-in engine.  A custom backend
(e.g. an inverted-index service) registers a class with the same
``search()`` signature and is selected by name in the server config::

    [search]
    engine: mybackend

Every backend receives the (possibly restricted) cell and must honor
it — otherwise search becomes a side channel that enumerates member
values the authorizer was configured to hide.
"""

from __future__ import annotations

from typing import Any, List, Optional

__all__ = ["Searcher", "SimpleSearcher"]


class Searcher:
    """Search backend interface (parity: the reference's external
    searcher objects, blueprint.py:555-573)."""

    def __init__(self, browser: Any = None, **options: Any) -> None:
        self.browser = browser
        self.options = options

    def search(self, query: str, dimension: Any,
               hierarchy: Any = None, cell: Any = None,
               locale: Optional[str] = None,
               limit: Optional[int] = None) -> List[dict]:
        """Return match dicts: ``{dimension, level, attribute, value,
        path}``."""
        raise NotImplementedError


class SimpleSearcher(Searcher):
    """Built-in engine: case-insensitive substring scan of distinct
    members, level by level.  Each level probe is one DISTINCT over
    the join-pruned star, so the scan pushes down (column pruning +
    dimension-only joins) like any members query and never touches
    fact columns it does not need."""

    def search(self, query: str, dimension: Any,
               hierarchy: Any = None, cell: Any = None,
               locale: Optional[str] = None,
               limit: Optional[int] = None) -> List[dict]:
        from pyspark.sql import functions as F

        browser = self.browser
        cube = browser.cube
        dimension = cube.dimension(dimension)
        hierarchy = dimension.hierarchy(hierarchy)
        needle = query.lower()

        matches: List[dict] = []
        for depth in range(1, len(hierarchy.levels) + 1):
            level = hierarchy.levels[depth - 1]
            df = browser.members_dataframe(
                cell, dimension, depth=depth, hierarchy=hierarchy.name
            )
            conds = None
            searchable = [
                a.ref for a in level.attributes
                if dict(df.dtypes).get(a.ref) == "string"
            ]
            for ref in searchable:
                cond = F.lower(F.col(f"`{ref}`")).contains(needle)
                conds = cond if conds is None else (conds | cond)
            if conds is None:
                continue
            key_refs = [
                hierarchy.levels[i].key.ref for i in range(depth)
            ]
            rows = df.filter(conds)
            if limit:
                rows = rows.limit(limit)
            for row in rows.collect():
                data = row.asDict()
                for ref in searchable:
                    value = data.get(ref)
                    if value and needle in str(value).lower():
                        matches.append({
                            "dimension": dimension.name,
                            "level": level.name,
                            "attribute": ref,
                            "value": value,
                            "path": [data.get(k) for k in key_refs],
                        })
        return matches
