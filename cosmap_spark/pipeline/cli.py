"""CLI: ``python -m cosmap_spark.pipeline.cli <cmd>`` —
install / uninstall / run / list / locate (reference
src/cosmap/entrypoint.py:8-88, click-based; argparse here to avoid the
extra dependency)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cosmap-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("install", help="register an analysis directory")
    sp.add_argument("directory")
    sp = sub.add_parser("uninstall", help="remove an analysis from the registry")
    sp.add_argument("name")
    sub.add_parser("list", help="list installed analyses")
    sp = sub.add_parser("locate", help="print an analysis' directory")
    sp.add_argument("name")
    sp = sub.add_parser("run", help="run an analysis config (JSON file)")
    sp.add_argument("config")
    sp.add_argument(
        "--catalog", required=True,
        help="registered dataset NAME or parquet path of the catalog table",
    )
    sp.add_argument("--show", type=int, default=20)

    sp = sub.add_parser(
        "register-dataset", help="register a named dataset (heinlein analog)"
    )
    sp.add_argument("name")
    sp.add_argument("path")
    sp.add_argument("--format", default="parquet", dest="fmt")
    sp.add_argument("--columns", nargs="*", default=None)
    sp.add_argument("--schema", default=None, help="declared schema (hdf5 only)")
    sp = sub.add_parser("unregister-dataset", help="remove a named dataset")
    sp.add_argument("name")
    sub.add_parser("datasets", help="list registered datasets")

    args = p.parse_args(argv)
    from cosmap_spark.pipeline.errors import CosmapSparkError

    try:
        return _dispatch(args)
    except CosmapSparkError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


def _load_run_config(path: str) -> dict:
    """Config ingestion with suffix dispatch — JSON or TOML (reference O4,
    src/cosmap/api/cmds.py:20-30)."""
    if path.endswith(".toml"):
        import tomllib

        with open(path, "rb") as fh:
            return tomllib.load(fh)
    with open(path) as fh:
        return json.load(fh)


def _dispatch(args: argparse.Namespace) -> int:
    from cosmap_spark.pipeline import manage

    if args.cmd == "install":
        name = manage.install_analysis(args.directory)
        print(f"installed analysis {name!r}")
    elif args.cmd == "uninstall":
        manage.uninstall_analysis(args.name)
        print(f"uninstalled analysis {args.name!r}")
    elif args.cmd == "list":
        for name, path in sorted(manage.list_analyses().items()):
            print(f"{name}\t{path}")
    elif args.cmd == "locate":
        print(manage.locate_analysis(args.name))
    elif args.cmd == "register-dataset":
        from cosmap_spark.sources import datasets

        datasets.register_dataset(
            args.name, args.path, fmt=args.fmt, columns=args.columns,
            schema=args.schema,
        )
        print(f"registered dataset {args.name!r}")
    elif args.cmd == "unregister-dataset":
        from cosmap_spark.sources import datasets

        datasets.unregister_dataset(args.name)
        print(f"unregistered dataset {args.name!r}")
    elif args.cmd == "datasets":
        from cosmap_spark.sources import datasets

        for name, entry in sorted(datasets.list_datasets().items()):
            print(f"{name}\t{entry['format']}\t{entry['path']}")
    elif args.cmd == "run":
        run_config = _load_run_config(args.config)
        base = manage.load_analysis_files(
            manage.locate_analysis(run_config["base-analysis"])
        )
        if "analysis-mod" in run_config:
            mod = manage.load_analysis_files(
                manage.locate_analysis(run_config["analysis-mod"])
            )
            base = manage.combine_with_mod(base, mod)
        from cosmap_spark.pipeline import plugins as plugin_registry
        from cosmap_spark.pipeline.analysis import Analysis
        from cosmap_spark.pipeline.config import combine_run_config
        from cosmap_spark.session import get_spark

        if "plugins_file" in base:
            plugin_registry.load_external(base["plugins_file"], replace=True)

        cfg = combine_run_config(base["parameters"], run_config)
        spark = get_spark(app_name=f"cosmap-run-{run_config['base-analysis']}")
        analysis = Analysis(
            cfg, base["transformations"], base["implementations"],
            setup_block=base.get("setup"),
            setup_implementations=base.get("implementations"),
        )
        from cosmap_spark.sources.datasets import open_dataset

        result = analysis.run(spark, open_dataset(spark, args.catalog))
        result.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
