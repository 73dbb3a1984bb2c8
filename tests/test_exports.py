"""API-surface pin — the analog of the reference's ABI guard
(clients/Tests/exports.py diffs every *_export symbol against a stable
list). Additions are allowed (extend EXPECTED); removals/renames fail."""

import importlib

EXPECTED = {
    "monetdb_tpu": ["__version__"],
    "monetdb_tpu.session": ["Session"],
    "monetdb_tpu.storage": ["Database"],
    "monetdb_tpu.engine": ["Engine", "Result"],
    "monetdb_tpu.server": ["Server", "Client"],
    "monetdb_tpu.farm": ["Farm", "Funnel"],
    "monetdb_tpu.dbapi": ["connect", "Connection", "Cursor", "apilevel",
                          "paramstyle"],
    "monetdb_tpu.dump": ["dump_sql", "restore_sql", "sql_type_name"],
    "monetdb_tpu.udf": ["UDF", "compile_python_udf"],
    "monetdb_tpu.cli": ["main", "format_table"],
    "monetdb_tpu.table": ["Table", "Catalog"],
    "monetdb_tpu.column": ["Column", "Cand", "StrDict"],
    "monetdb_tpu.config": ["get", "set", "reset"],
    "monetdb_tpu.sql.parser": ["parse", "parse_expr"],
    "monetdb_tpu.sql.binder": ["bind_select", "Binder", "BindError"],
    "monetdb_tpu.sql.distribute": [
        "MergeDef", "RemoteDef", "ReplicaDef", "PartSpec",
        "expand_distribution", "prune_members", "route_partition",
        "to_sql"],
    "monetdb_tpu.sql.syscat": ["system_table", "is_system_table", "QUEUE",
                               "QueryKilled"],
    "monetdb_tpu.ops.select": [],
    "monetdb_tpu.ops.join": [],
    "monetdb_tpu.ops.group": [],
    "monetdb_tpu.ops.aggr": [],
    "monetdb_tpu.ops.sort": [],
    "monetdb_tpu.ops.window": [],
    "monetdb_tpu.ops.strfuncs": ["levenshtein", "editdistance",
                                 "jarowinkler", "soundex", "difference",
                                 "qgram_normalize", "like_cand"],
    "monetdb_tpu.ops.jsonfuncs": ["isvalid", "filter_path", "text",
                                  "length", "keyarray", "valuearray"],
    "monetdb_tpu.parallel.shuffle": [],
    "monetdb_tpu.parallel.mitosis": [],
    "monetdb_tpu.obs": ["PROFILER", "set_algorithm"],
}


def test_api_surface_pinned():
    missing = []
    for modname, symbols in EXPECTED.items():
        mod = importlib.import_module(modname)
        for sym in symbols:
            if not hasattr(mod, sym):
                missing.append(f"{modname}.{sym}")
    assert not missing, f"public API symbols removed/renamed: {missing}"
