"""``slicer`` command-line tool.

Parity: /root/reference/cubes/slicer/commands.py:38-410 (the click CLI)
re-expressed with argparse: ``serve``, ``list``, ``model validate``,
``test``, ``aggregate`` (query-style, commands.py:441-509),
``members`` (commands.py:512-587), ``denormalize`` /
``sql-aggregate`` (the ``sql denormalize`` / ``sql aggregate``
materializers).

Configuration is a JSON file::

    {
      "store": "/path/to/parquet-dir",
      "model": "/path/to/model.json",       # or inline "model": {...}
      "naming": {...},                       # optional
      "server": {"json_record_limit": 1000}  # optional
    }

or a reference-format ``slicer.ini`` (ConfigParser; parity:
/root/reference/cubes/config_parser.py:9-31 and
workspace.py:55-290)::

    [workspace]
    models_directory: models
    timezone: UTC

    [store]
    type: spark
    path: /path/to/parquet-dir

    [model]
    path: model.json

    [server]
    json_record_limit: 1000
    authentication: pass_parameter

Usage: ``python -m cubes_spark.slicer <command> ...``.
"""

from __future__ import annotations

import argparse
import configparser
import json
import os
import sys
from typing import Any, Optional

from cubes_spark.errors import ConfigurationError
from cubes_spark.formatters import SlicerJSONEncoder

__all__ = ["main", "build_workspace", "read_slicer_config"]

#: sections copied verbatim into the config dict (values interpreted)
_PASSTHROUGH_SECTIONS = {
    "authorization": "authorization",
    "authentication": "authentication",
    "browser": "browser",
    "search": "search",
    "main": "options",
}


def _interpret(value: str) -> Any:
    """ini string -> bool/int/float where unambiguous (parity:
    reference workspace.py:40-48 interpret_config_value, extended with
    numbers so json_record_limit/port/first_weekday need no special
    cases)."""
    low = value.lower()
    if low in ("yes", "true", "on"):
        return True
    if low in ("no", "false", "off"):
        return False
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    return value


def _section_dict(parser: configparser.ConfigParser, section: str) -> dict:
    return {k: _interpret(v) for k, v in parser.items(section)}


def _config_from_ini(parser: configparser.ConfigParser,
                     base_dir: str = "") -> dict:
    """Reference ``slicer.ini`` -> internal config dict (parity:
    reference workspace.py:55-290 section-by-section).

    Sections: ``[workspace]`` (root/models directories, timezone,
    first_weekday, authorization type), ``[store]`` (default store —
    ``type`` must be a parquet-directory type: ``spark``/``parquet``),
    ``[store_NAME]`` (named stores, recorded), ``[model]`` /
    ``[models]`` (model paths, relative to models_directory),
    ``[server]``, ``[authorization]``, ``[authentication]``,
    ``[browser]``, ``[main]``, ``[locale XX]`` (per-namespace
    translation paths)."""
    config: dict = {}
    ws = _section_dict(parser, "workspace") \
        if parser.has_section("workspace") else {}

    root_dir = ws.get("root_directory") or base_dir
    models_dir = ws.get("models_directory") or ws.get("models_path") or ""
    if root_dir and models_dir and not os.path.isabs(str(models_dir)):
        models_dir = os.path.join(root_dir, str(models_dir))
    models_dir = models_dir or root_dir

    def _resolve(path: Any, base: str) -> Any:
        if isinstance(path, str) and base and not os.path.isabs(path):
            return os.path.join(base, path)
        return path

    if ws:
        config["workspace"] = ws

    # -- stores: [store] is the default; [store_NAME] are named extras
    #    (reference workspace.py:205-223).  Only parquet-directory
    #    stores are runnable here; anything else fails like an
    #    unregistered store type does in the reference (ext factory).
    def _store_entry(section: str) -> dict:
        info = _section_dict(parser, section)
        stype = str(info.get("type", "spark")).lower()
        if stype not in ("spark", "parquet"):
            raise ConfigurationError(
                f"unknown store type {stype!r} in [{section}]: "
                "cubes_spark stores are parquet directories "
                "(type: spark or parquet with a path/url)")
        path = info.get("path") or info.get("url")
        if not path:
            raise ConfigurationError(
                f"store section [{section}] has no path/url")
        info["path"] = _resolve(path, root_dir)
        return info

    if parser.has_section("store"):
        config["store"] = _store_entry("store")["path"]
    extra_stores = {}
    for section in parser.sections():
        if section.startswith("store_"):
            extra_stores[section[6:]] = _store_entry(section)
    if extra_stores:
        # registered on the workspace: a cube's `store` metadata
        # selects one by name (one SparkSession reads them all)
        config["stores"] = extra_stores

    # -- models: [model] path (undepreciated) + [models] items
    #    (reference workspace.py:273-288)
    models = []
    if parser.has_section("model"):
        if not parser.has_option("model", "path"):
            raise ConfigurationError("No model path specified in [model]")
        models.append(_resolve(parser.get("model", "path"), models_dir))
    if parser.has_section("models"):
        models += [_resolve(path, models_dir)
                   for _, path in parser.items("models")]
    if models:
        config["model"] = models[0]
        if models[1:]:
            config["models"] = models[1:]

    if parser.has_section("server"):
        server = _section_dict(parser, "server")
        authn = server.pop("authentication", None)
        if authn and "authentication" not in config:
            config["authentication"] = {"method": authn}
        config["server"] = server

    for section, key in _PASSTHROUGH_SECTIONS.items():
        if parser.has_section(section):
            merged = {**config.get(key, {}), **_section_dict(parser, section)}
            config[key] = merged

    if ws.get("authorization"):
        # [workspace] authorization = simple + [authorization] options
        config.setdefault("authorization", {})

    # -- [locale XX]: namespace -> translation path
    #    (reference workspace.py:240-250)
    translations: dict = {}
    for section in parser.sections():
        if section.startswith("locale"):
            locale = section.split(None, 1)[1] if " " in section \
                else section[len("locale_"):] if section.startswith("locale_") \
                else section[len("locale"):]
            if not locale:
                raise ConfigurationError(
                    f"locale section [{section}] names no locale")
            translations[locale] = {
                ns: _resolve(path, root_dir)
                for ns, path in parser.items(section)
            }
    if translations:
        config["translations"] = translations
    return config


def read_slicer_config(config: Any) -> dict:
    """Config dict, JSON path, or reference-format ``slicer.ini`` path
    -> config dict (parity: reference config_parser.py:9-31
    read_slicer_config, which returns a ConfigParser; here both
    formats normalize to the JSON-shape dict)."""
    if config is None:
        return {}
    if isinstance(config, dict):
        return config
    if not isinstance(config, str):
        raise ConfigurationError(
            f"config should be a path or dict, got {type(config)!r}")
    if config.endswith((".ini", ".cfg", ".conf")):
        parser = configparser.ConfigParser()
        try:
            with open(config, encoding="utf-8") as f:
                parser.read_file(f)
        except OSError as exc:
            raise ConfigurationError(
                f"Unable to load configuration: {exc}")
        except configparser.Error as exc:
            raise ConfigurationError(
                f"Unable to parse configuration {config}: {exc}")
        return _config_from_ini(parser, os.path.dirname(config))
    with open(config, encoding="utf-8") as f:
        return json.load(f)


def _load_config(path: str) -> dict:
    return read_slicer_config(path)


def build_workspace(config: dict, spark: Any = None):
    """Workspace from config.  ``model`` loads into the root
    namespace; ``models`` is a list of either model paths/dicts or
    ``{"model": ..., "namespace": "a.b"}`` entries for multi-model /
    multi-namespace deployments (parity: multiple models in
    slicer.ini, reference workspace.py:240-260)."""
    from cubes_spark.sources.workspace import Workspace, default_session

    spark = spark or default_session("slicer")
    workspace = Workspace(
        spark,
        store=config.get("store"),
        naming=config.get("naming"),
    )
    # named [store_NAME] sections: cubes select one via their `store`
    # metadata (parity: reference workspace store registry)
    for name, info in (config.get("stores") or {}).items():
        workspace.register_store(name, info)
    model = config.get("model")
    if model:
        workspace.import_model(model)
    for entry in config.get("models") or []:
        if isinstance(entry, dict) and (
                "model" in entry or "namespace" in entry):
            workspace.import_model(entry.get("model"),
                                   namespace=entry.get("namespace"))
        else:
            workspace.import_model(entry)
    # [locale XX] sections from a slicer.ini: {locale: {ns: path}}
    # (reference workspace.py:240-250)
    for locale, per_ns in (config.get("translations") or {}).items():
        for ns, path in per_ns.items():
            workspace.add_translation(
                locale, path, None if ns in ("default", "defalt") else ns)
    return workspace


def cmd_list(config: dict, args: argparse.Namespace, out=sys.stdout) -> int:
    """List cubes (parity: commands.py `list`)."""
    workspace = build_workspace(config)
    for info in workspace.list_cubes():
        label = info.get("label") or ""
        out.write(f"{info['name']}    {label}\n".rstrip() + "\n")
    return 0


def cmd_validate(config: dict, args: argparse.Namespace,
                 out=sys.stdout) -> int:
    """Validate model metadata (parity: commands.py `model validate`).

    Two passes, like the reference: JSON-schema validation against
    the ported model/cube/dimension schemas
    (cubes_spark.metadata.schemas; reference cubes/schemas/*.json),
    then the structural pass (objects actually instantiate, links
    resolve)."""
    from cubes_spark.sources.workspace import read_model
    from cubes_spark.metadata.cube import Cube
    from cubes_spark.metadata.dimension import Dimension
    from cubes_spark.metadata.schemas import validate_model

    metadata = read_model(args.model or config.get("model"))
    errors = []
    warnings = []
    for severity, owner, message in validate_model(metadata):
        target = errors if severity == "error" else warnings
        target.append((owner, message))
    dimensions = {}
    for dim_md in metadata.get("dimensions", []):
        try:
            dim = Dimension.from_metadata(dim_md, templates=dimensions)
            dimensions[dim.name] = dim
        except Exception as exc:
            errors.append((dim_md.get("name", "?"), str(exc)))
    for cube_md in metadata.get("cubes", []):
        try:
            cube = Cube.from_metadata(cube_md)
            for link in cube.dimension_links:
                name = link["name"]
                if name in dimensions:
                    cube.link_dimension(dimensions[name])
            for severity, message in cube.validate() or []:
                target = errors if severity == "error" else warnings
                target.append((cube.name, message))
        except Exception as exc:
            errors.append((cube_md.get("name", "?"), str(exc)))

    for owner, message in warnings:
        out.write(f"WARNING {owner}: {message}\n")
    if errors:
        for owner, message in errors:
            out.write(f"ERROR {owner}: {message}\n")
        out.write(f"{len(errors)} error(s)\n")
        return 1
    out.write("model is valid\n")
    return 0


def cmd_test(config: dict, args: argparse.Namespace, out=sys.stdout) -> int:
    """Smoke-test every cube's star (parity: commands.py `test`,
    including its --store / -E store include/exclude filters — useful
    now that cubes can live on named stores)."""
    workspace = build_workspace(config)
    names = args.cube or [c["name"] for c in workspace.list_cubes()]
    include = set(args.store or [])
    exclude = set(args.exclude_store or [])
    failures = tested = 0
    for name in names:
        try:
            cube_store = workspace.cube(name).store or "default"
        except Exception as exc:
            # an unknown/broken cube must not abort the sweep
            failures += 1
            out.write(f"FAIL  {name}: {exc}\n")
            continue
        if include and cube_store not in include:
            out.write(f"SKIP  {name} (store '{cube_store}')\n")
            continue
        if cube_store in exclude:
            out.write(f"SKIP  {name} (store '{cube_store}')\n")
            continue
        tested += 1
        try:
            browser = workspace.browser(name)
            browser.test(aggregate=args.aggregate)
            out.write(f"OK    {name}\n")
        except Exception as exc:
            failures += 1
            out.write(f"FAIL  {name}: {exc}\n")
    out.write(f"tested {tested} cubes, {failures} failed\n")
    return 1 if failures else 0


def cmd_denormalize(config: dict, args: argparse.Namespace,
                    out=sys.stdout) -> int:
    """Materialize the denormalized star to parquet
    (parity: commands.py `sql denormalize`)."""
    from cubes_spark.operators.olap import materialize_denormalized

    workspace = build_workspace(config)
    browser = workspace.browser(args.cube)
    materialize_denormalized(browser, args.target,
                             partition_by=args.partition_by)
    out.write(f"denormalized '{args.cube}' -> {args.target}\n")
    return 0


def cmd_sql_aggregate(config: dict, args: argparse.Namespace,
                      out=sys.stdout) -> int:
    """Materialize a pre-aggregated cuboid
    (parity: commands.py `sql aggregate`).  With ``--auto-picks N``
    the drilldowns become lattice dimensions instead: the advisor
    sizes every cuboid in one pass, greedy-picks the N most valuable
    (HRU benefit model) and materializes those under the target
    directory (operators/preagg.py:auto_materialize)."""
    from cubes_spark.operators.olap import materialize_aggregate

    workspace = build_workspace(config)
    browser = workspace.browser(args.cube)
    if getattr(args, "auto_picks", None):
        from cubes_spark.operators.preagg import auto_materialize

        built = auto_materialize(browser, args.target,
                                 args.drilldown or [],
                                 aggregates=args.aggregates,
                                 n_picks=args.auto_picks)
        for cuboid in built:
            out.write(f"materialized {cuboid.path} "
                      f"({cuboid.rows} rows)\n")
        if not built:
            out.write("no cuboid worth materializing "
                      "(HRU benefit <= 0 for every candidate)\n")
        return 0
    materialize_aggregate(browser, args.target,
                          drilldown=args.drilldown or [],
                          aggregates=args.aggregates)
    out.write(f"aggregated '{args.cube}' -> {args.target}\n")
    return 0


def cmd_aggregate(config: dict, args: argparse.Namespace,
                  out=sys.stdout) -> int:
    """Query-style aggregation of a cube to stdout (parity:
    commands.py:441-509 `aggregate`): cuts, drilldown, split, an
    aggregate subset and a formatter — the same request the server's
    /aggregate route answers, from the shell."""
    from cubes_spark import ext
    from cubes_spark.errors import InternalError

    workspace = build_workspace(config)
    browser = workspace.browser(args.cube)
    cube = browser.cube

    cell = "|".join(args.cuts) if args.cuts else None
    aggregates = list(args.aggregates) or None
    drilldown = [part for item in (args.drilldown or [])
                 for part in item.split(",") if part]

    result = browser.aggregate(
        cell,
        aggregates=aggregates,
        drilldown=drilldown,
        split=args.split or None,
    )

    if args.format == "json":
        encoder = SlicerJSONEncoder(indent=4)
        out.write(encoder.encode(result.to_dict()) + "\n")
        return 0
    try:
        formatter = ext.formatter.create(args.format)
    except InternalError:
        out.write(f"Unknown format '{args.format}'\n")
        return 1
    import inspect

    accepted = set(inspect.signature(formatter.format).parameters)
    fmt_kwargs = {}
    if "onrows" in accepted and args.on_rows:
        fmt_kwargs["onrows"] = list(args.on_rows)
    if "oncolumns" in accepted and args.on_columns:
        fmt_kwargs["oncolumns"] = list(args.on_columns)
    if "aggregates_on" in accepted:
        fmt_kwargs["aggregates_on"] = "columns"
    output = formatter.format(cube, result, **fmt_kwargs)
    if isinstance(output, bytes):  # xlsx: binary workbook
        getattr(out, "buffer", out).write(output)
    else:
        out.write(output if output.endswith("\n") else output + "\n")
    return 0


def _parse_dimension_level(ref: str) -> tuple:
    """``dim[@hierarchy][:level]`` -> (dim, hierarchy, level)
    (parity: cubes/model.py string_to_dimension_level)."""
    level = hierarchy = None
    if ":" in ref:
        ref, level = ref.split(":", 1)
    if "@" in ref:
        ref, hierarchy = ref.split("@", 1)
    return ref, hierarchy, level


def cmd_members(config: dict, args: argparse.Namespace,
                out=sys.stdout) -> int:
    """List distinct dimension members to stdout (parity:
    commands.py:512-587 `members`): cell cuts, a ``dim@hier:level``
    dimension reference and json/csv/json_lines/xlsx output."""
    workspace = build_workspace(config)
    browser = workspace.browser(args.cube)
    cube = browser.cube

    cell = "|".join(args.cuts) if args.cuts else None
    dim_name, hier_name, level_name = _parse_dimension_level(args.dimension)
    dimension = cube.dimension(dim_name)
    hierarchy = dimension.hierarchy(hier_name)
    depth = hierarchy.level_index(level_name) + 1 if level_name \
        else len(hierarchy.levels)

    values = browser.members(cell, dimension, depth=depth,
                             hierarchy=hier_name)

    attributes = [a for lvl in hierarchy.levels_for_depth(depth)
                  for a in lvl.attributes]
    fields = [a.ref for a in attributes]
    labels = [a.label or a.name for a in attributes]

    if args.format == "json":
        out.write(SlicerJSONEncoder(indent=4).encode(values) + "\n")
    elif args.format == "json_lines":
        encoder = SlicerJSONEncoder()
        for value in values:
            out.write(encoder.encode(value) + "\n")
    elif args.format == "csv":
        from cubes_spark.formatters import csv_generator

        for chunk in csv_generator(values, fields, include_header=True,
                                   header=labels):
            out.write(chunk)
    elif args.format == "xlsx":
        from cubes_spark.formatters import _write_xlsx

        rows = [list(labels)]
        rows += [[value.get(f) for f in fields] for value in values]
        getattr(out, "buffer", out).write(_write_xlsx(rows))
    return 0


def cmd_serve(config: dict, args: argparse.Namespace, out=sys.stdout) -> int:
    """Run the slicer HTTP server (parity: commands.py `serve`)."""
    from cubes_spark.server import create_server

    workspace = build_workspace(config)
    server_config = config.get("server", {})
    authorizer = None
    auth_config = config.get("authorization")
    # an EMPTY dict still means "authorization requested" — an ini
    # with `[workspace] authorization = simple` and no [authorization]
    # options must not silently run wide open
    if auth_config is not None:
        from cubes_spark.auth import SimpleAuthorizer

        authorizer = SimpleAuthorizer(**auth_config)
    # authentication: {"method": "pass_parameter" | "none" |
    # "http_basic_proxy" | "admin_admin", ...options}
    # (parity: [server] authentication = in slicer.ini)
    authn_config = dict(config.get("authentication") or {})
    authenticator = None
    if authn_config:
        from cubes_spark.server.authenticators import create_authenticator

        authenticator = create_authenticator(
            authn_config.pop("method", None), **authn_config
        )
    # request logging: {"request_log": {"handlers": [{"type":
    # "jsonl", "path": "queries.jsonl"}], "async": true}}
    request_logger = None
    if server_config.get("request_log"):
        from cubes_spark.server.request_log import \
            configured_request_logger

        request_logger = configured_request_logger(
            server_config["request_log"])
    app = create_server(
        workspace,
        authorizer=authorizer,
        json_record_limit=server_config.get("json_record_limit", 1000),
        authenticator=authenticator,
        request_logger=request_logger,
        visualizer=getattr(args, "visualizer", None)
        or server_config.get("visualizer"),
        allow_cors_origin=server_config.get("allow_cors_origin"),
        search=config.get("search"),
        # [server] http_cache = true / ttl seconds enables response
        # caching (server/caching.py); ETag/304 is always on
        http_cache=True if server_config.get("http_cache") else None,
        http_cache_ttl=float(server_config.get("http_cache_ttl", 60)),
    )
    # [server] host/port from a slicer.ini apply unless flags are
    # EXPLICITLY passed (parser defaults are None, not sentinels — an
    # explicit `--host 127.0.0.1` must win over the ini)
    host = args.host if args.host is not None \
        else server_config.get("host", "127.0.0.1")
    port = args.port if args.port is not None \
        else int(server_config.get("port", 5000))
    app.run(host=host, port=port, debug=args.debug)
    return 0


def cmd_textstats(config: dict, args: argparse.Namespace,
                  out=sys.stdout) -> int:
    """Annotate a text table with quality statistics, language ID,
    BPE-ish token counts, repetition fractions and (optionally)
    PII-redacted text, written as parquet — the text-analysis pass of
    a training-data pipeline as one CLI step."""
    from pyspark.sql import functions as F

    from cubes_spark.llm import (
        bpe_token_count,
        language_id,
        redact_pii,
        repetition_stats,
        text_stats,
    )

    workspace = build_workspace(config)
    df = workspace.table(args.table)
    annotated = text_stats(df, text_col=args.text_column)
    annotated = language_id(annotated, text_col=args.text_column)
    annotated = repetition_stats(annotated, text_col=args.text_column)
    annotated = annotated.withColumn(
        "n_bpe_tokens", bpe_token_count(F.col(args.text_column))
    )
    if args.redact:
        annotated = redact_pii(annotated, text_col=args.text_column)
    annotated.write.mode("overwrite").parquet(args.target)
    n = annotated.count()
    out.write(f"textstats '{args.table}' -> {args.target}: {n} docs\n")
    return 0


def cmd_dedup(config: dict, args: argparse.Namespace,
              out=sys.stdout) -> int:
    """Deduplicate a store table: near-duplicate candidate generation
    (exact / minhash / simhash / embedding), connected-components
    clustering and canonical-member selection, written as a
    ``(id, component, is_canonical)`` parquet — the training-data
    dedup pipeline as one CLI step."""
    from cubes_spark.llm import (
        duplicate_clusters,
        embedding_near_duplicates,
        exact_duplicates,
        minhash_candidate_pairs,
        simhash_near_duplicates,
    )

    workspace = build_workspace(config)
    df = workspace.table(args.table)
    id_col, text_col = args.id_column, args.text_column

    if args.method == "exact":
        clusters = exact_duplicates(df, text_col=text_col, id_col=id_col)
        # expand the (hash, size, canonical) cluster list to the
        # per-document shape: re-derive each doc's content hash and
        # join (left: non-duplicated docs are their own component)
        from pyspark.sql import functions as F

        from cubes_spark.llm.dedup import content_hash

        docs = df.select(
            F.col(id_col),
            content_hash(F.col(text_col)).alias("content_hash"),
        )
        joined = docs.join(
            clusters.select("content_hash", "canonical_id"),
            "content_hash", "left",
        )
        component = F.coalesce(F.col("canonical_id"), F.col(id_col))
        result = joined.select(
            F.col(id_col),
            component.alias("component"),
            (component == F.col(id_col)).alias("is_canonical"),
        )
    else:
        if args.method == "minhash":
            pairs = minhash_candidate_pairs(df, text_col=text_col,
                                            id_col=id_col)
        elif args.method == "simhash":
            pairs = simhash_near_duplicates(df, text_col=text_col,
                                            id_col=id_col)
        elif args.method == "embedding":
            pairs = embedding_near_duplicates(
                df, threshold=args.threshold, id_col=id_col,
                vec_col=args.vector_column,
            )
        else:
            out.write(f"Unknown dedup method '{args.method}'\n")
            return 1
        result = duplicate_clusters(df, pairs, id_col=id_col)

    result.write.mode("overwrite").parquet(args.target)
    kept = result.filter("is_canonical").count()
    total = result.count()
    out.write(
        f"dedup[{args.method}] '{args.table}' -> {args.target}: "
        f"{total} docs, {kept} canonical, {total - kept} duplicates\n"
    )
    return 0


def cmd_dq(config: dict, args: argparse.Namespace,
           out=sys.stdout) -> int:
    """Run a declarative data-quality suite (operators/dq.py) against
    a store table: rules come from a JSON file; ``foreign_key`` rules
    name their reference table by store name (``"ref": "customer"``)
    and resolve through the workspace.  Prints one line per rule;
    exits 1 when any rule fails and --strict is set — the CI gate
    shape."""
    import json as _json

    from cubes_spark.operators.dq import dq_check

    workspace = build_workspace(config)
    df = workspace.table(args.table)
    with open(args.rules) as fh:
        rules = _json.load(fh)
    for rule in rules:
        if rule.get("check") == "foreign_key" \
                and isinstance(rule.get("ref"), str):
            rule["ref"] = workspace.table(rule["ref"])
    result = dq_check(df, rules).collect()
    failed = 0
    for row in result:
        status = "PASS" if row.passed else "FAIL"
        failed += 0 if row.passed else 1
        out.write(f"{status} {row.rule}: {row.n_violations} "
                  f"violation(s) in {row.n_rows} rows\n")
    out.write(f"{len(result) - failed} passed, {failed} failed\n")
    return 1 if (failed and args.strict) else 0


def cmd_ext_info(config: dict, args: argparse.Namespace,
                 out=sys.stdout) -> int:
    """List registered extensions (parity: commands.py:70-104
    `ext-info`): every ExtensionFinder type — builtins plus any
    ``cubes_spark.<type>`` entry points of installed packages
    (reference ext.py finders)."""
    from cubes_spark import ext
    from cubes_spark.functions.aggregates import available_aggregate_functions
    from cubes_spark.functions.calculators import available_calculators

    registry = {
        etype: sorted(ext.finder(etype).names())
        for etype in ext.EXTENSION_TYPES
    }
    # these two have their own in-module registries as well
    registry["aggregate_function"] = sorted(
        set(registry["aggregate_function"])
        | set(available_aggregate_functions()))
    registry["calculator"] = sorted(
        set(registry["calculator"]) | set(available_calculators()))
    ext_type = getattr(args, "type", None) or "all"
    if ext_type != "all":
        if ext_type not in registry:
            out.write(f"Unknown extension type '{ext_type}' "
                      f"(expected one of {sorted(registry)})\n")
            return 1
        registry = {ext_type: registry[ext_type]}
    for etype, names in registry.items():
        out.write(f"{etype}:\n")
        for name in names:
            out.write(f"    {name}\n")
    return 0


def cmd_convert(config: dict, args: argparse.Namespace,
                out=sys.stdout) -> int:
    """Convert model metadata between JSON and bundle-directory formats
    (parity: commands.py:290-310 `model convert`)."""
    from cubes_spark.sources.workspace import read_model, \
        write_model_bundle

    metadata = read_model(args.model)
    if args.format == "json":
        if args.target:
            with open(args.target, "w", encoding="utf-8") as f:
                json.dump(metadata, f, indent=4)
        else:
            out.write(json.dumps(metadata, indent=4) + "\n")
    else:
        if not args.target:
            out.write("Target directory required for bundle format\n")
            return 1
        write_model_bundle(args.target, metadata, replace=args.force)
    return 0


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="slicer", description="cubes_spark OLAP server tool"
    )
    parser.add_argument("--config", default="slicer.json",
                        help="JSON configuration file")
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("list", help="list cubes")

    p = sub.add_parser("validate", help="validate model metadata")
    p.add_argument("model", nargs="?", help="model path (default: config)")

    p = sub.add_parser("test", help="smoke-test cube stars")
    p.add_argument("cube", nargs="*", help="cubes to test (default: all)")
    p.add_argument("--aggregate", action="store_true",
                   help="also run a full aggregation")
    p.add_argument("--store", action="append", default=None,
                   help="only test cubes on this store (repeatable)")
    p.add_argument("--exclude-store", "-E", dest="exclude_store",
                   action="append", default=None,
                   help="skip cubes on this store (repeatable)")

    p = sub.add_parser("denormalize", help="materialize denormalized star")
    p.add_argument("cube")
    p.add_argument("target", help="output parquet path")
    p.add_argument("--partition-by", nargs="*", default=None)

    p = sub.add_parser("sql-aggregate",
                       help="materialize aggregated cuboid")
    p.add_argument("cube")
    p.add_argument("target", help="output parquet path")
    p.add_argument("--drilldown", nargs="*", default=None)
    p.add_argument("--aggregates", nargs="*", default=None)
    p.add_argument("--auto-picks", type=int, default=None,
                   dest="auto_picks", metavar="N",
                   help="advisor mode: size the cuboid lattice over "
                   "the drilldowns, greedy-pick the N most valuable "
                   "(HRU) and materialize those under TARGET")

    p = sub.add_parser("aggregate", help="aggregate a cube to stdout")
    p.add_argument("cube")
    p.add_argument("--aggregate", "-a", dest="aggregates",
                   action="append", default=[],
                   help="aggregate to get (repeatable; default: all)")
    p.add_argument("--cut", "-c", dest="cuts", action="append",
                   default=[], help="cell cut (repeatable)")
    p.add_argument("--split", default=None, help="split cell cut")
    p.add_argument("--drilldown", "-d", action="append", default=[],
                   help="drilldown dimension (repeatable)")
    p.add_argument("--on-row", dest="on_rows", action="append",
                   default=[],
                   help="attribute to put on row (cross_table)")
    p.add_argument("--on-column", dest="on_columns", action="append",
                   default=[],
                   help="attribute to put on column (cross_table)")
    p.add_argument("--format", "-f", default="cross_table",
                   help="output format (default: cross_table)")

    p = sub.add_parser("members",
                       help="list distinct dimension members")
    p.add_argument("cube")
    p.add_argument("dimension", help="dimension ref: dim[@hier][:level]")
    p.add_argument("--cut", "-c", dest="cuts", action="append",
                   default=[], help="cell cut (repeatable)")
    p.add_argument("--format", "-f", default="json",
                   choices=["json", "csv", "json_lines", "xlsx"],
                   help="output format (default: json)")

    p = sub.add_parser("serve", help="start the HTTP server")
    p.add_argument("--host", default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--visualizer", default=None,
                   help="visualizer URL served at /visualizer/ "
                        "(parity: reference `slicer serve "
                        "--visualizer`)")

    p = sub.add_parser("dedup",
                       help="near-duplicate clustering of a table")
    p.add_argument("table", help="store table to deduplicate")
    p.add_argument("target", help="output parquet path "
                                  "(id, component, is_canonical)")
    p.add_argument("--method", default="minhash",
                   choices=["exact", "minhash", "simhash", "embedding"])
    p.add_argument("--id-column", default="doc_id")
    p.add_argument("--text-column", default="text")
    p.add_argument("--vector-column", default="embedding")
    p.add_argument("--threshold", type=float, default=0.9,
                   help="cosine threshold (embedding method)")

    p = sub.add_parser("textstats",
                       help="annotate a text table with quality stats")
    p.add_argument("table")
    p.add_argument("target", help="output parquet path")
    p.add_argument("--text-column", default="text")
    p.add_argument("--redact", action="store_true",
                   help="also add PII-redacted text")

    p = sub.add_parser("dq", help="run data-quality rules on a table")
    p.add_argument("table", help="store table to check")
    p.add_argument("rules", help="JSON file with a list of rules")
    p.add_argument("--strict", action="store_true",
                   help="exit 1 when any rule fails")

    p = sub.add_parser("ext-info", help="show registered extensions")
    p.add_argument("type", nargs="?", default="all",
                   help="extension type (default: all)")

    p = sub.add_parser("convert",
                       help="convert model between json and bundle")
    p.add_argument("--format", choices=["json", "bundle"],
                   default="json", help="output model format")
    p.add_argument("--force", action="store_true",
                   help="replace an existing model bundle")
    p.add_argument("model", help="model path (json file or bundle dir)")
    p.add_argument("target", nargs="?", help="output path")

    return parser


COMMANDS = {
    "list": cmd_list,
    "validate": cmd_validate,
    "test": cmd_test,
    "denormalize": cmd_denormalize,
    "sql-aggregate": cmd_sql_aggregate,
    "aggregate": cmd_aggregate,
    "members": cmd_members,
    "serve": cmd_serve,
    "dedup": cmd_dedup,
    "textstats": cmd_textstats,
    "dq": cmd_dq,
    "ext-info": cmd_ext_info,
    "convert": cmd_convert,
}

#: commands that run without a workspace configuration file
CONFIG_FREE = {"ext-info", "convert"}


def main(argv: Optional[list] = None, out=sys.stdout) -> int:
    parser = make_parser()
    args = parser.parse_args(argv)
    config = {} if args.command in CONFIG_FREE \
        else _load_config(args.config)
    return COMMANDS[args.command](config, args, out=out)


if __name__ == "__main__":
    sys.exit(main())
