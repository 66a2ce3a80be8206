"""Command line for the cube builder — the reference's CLI surface
(`/root/reference/cube_builder/cli.py`) as one argparse entry point:

- ``load-data``   (cli.py:37-63): the reference seeds its DB with the
  three CompositeFunction rows and the application Processor record;
  our catalog keeps those as static values, so the command prints the
  same records (and can write them to a JSON seed file) — nothing to
  insert, which IS the equivalence.
- ``build``       (cli.py:81-144): STAC-driven cube build — delegates
  to tools/build_stac.py's machinery.
- ``build-local`` (cli.py:147-188): directory-scan cube build —
  delegates to tools/build_local.py's machinery.
- ``configure``   (cli.py:191-227): persist per-cube parameters via
  the service facade (CubeService.update_parameters).
- ``show-parameters`` (cli.py:230-241): display a cube's parameters.

Run as ``python -m cube_builder_spark.cli <command> ...``.
"""

from __future__ import annotations

import argparse
import json

from .api import COMPOSITE_FUNCTIONS

#: The `load-data` seed (reference cli.py:37-63): CompositeFunction
#: rows (shared with GET /composite-functions — one source of truth)
#: plus the application Processor record.
LOAD_DATA_RECORDS = {
    "composite_functions": COMPOSITE_FUNCTIONS,
    "processor": {
        "name": "cube_builder_spark",
        "facility": "",
        "level": "",
        "uri": "",
    },
}


def _cmd_load_data(args) -> int:
    payload = json.dumps(LOAD_DATA_RECORDS, indent=2)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(payload + "\n")
    print(payload)
    return 0


def _cmd_build(args) -> int:
    argv = [args.datacube, args.out,
            "--stac-url", args.stac_url,
            "--collections", args.collections,
            "--tiles", args.tiles,
            "--start", args.start, "--end", args.end]
    if args.bands:
        argv += ["--bands", args.bands]
    from tools.build_stac import main
    return main(argv) or 0


def _cmd_build_local(args) -> int:
    # tiles are not an argument here: the local scan derives them
    # from the scanned scene ids (sources/local_scan), which is the
    # reference's behavior too — its --tiles only filters the listing
    argv = [args.directory, args.out, "--cube", args.datacube]
    if args.start_date:
        argv += ["--start", args.start_date]
    if args.end_date:
        argv += ["--end", args.end_date]
    from tools.build_local import main
    return main(argv) or 0


def _service(workdir: str):
    from .api import CubeService
    return CubeService(workdir)


def _cmd_configure(args) -> int:
    svc = _service(args.workdir)
    bad = [kv for kv in (args.set or []) if "=" not in kv]
    if bad:
        # args.parser is the `configure` subparser (set_defaults in
        # build_parser), so the usage line shown is the subcommand
        # the user actually invoked — a freshly built top-level
        # parser would print the program's usage instead (r10 ADVICE)
        args.parser.error(
            f"--set expects KEY=VALUE, got: {', '.join(bad)}")
    params = dict(kv.split("=", 1) for kv in (args.set or []))
    out = svc.update_parameters(args.datacube, **params)
    print(json.dumps(out, indent=2, default=str))
    return 0


def _cmd_show_parameters(args) -> int:
    svc = _service(args.workdir)
    cube = svc.list_cubes(args.datacube)
    print(json.dumps(cube.get("parameters", {}), indent=2, default=str))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="cube-builder-spark",
                                 description=__doc__)
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("load-data",
                       help="print (or write) the seed records the "
                            "reference inserts into its DB")
    p.add_argument("--output", help="also write the JSON seed here")
    p.set_defaults(fn=_cmd_load_data)

    p = sub.add_parser("build", help="STAC-driven cube build")
    p.add_argument("datacube")
    p.add_argument("--collections", required=True)
    p.add_argument("--tiles", required=True)
    p.add_argument("--start", required=True)
    p.add_argument("--end", required=True)
    p.add_argument("--bands")
    p.add_argument("--stac-url", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=_cmd_build)

    p = sub.add_parser("build-local", help="directory-scan cube build")
    p.add_argument("datacube")
    p.add_argument("--directory", required=True)
    p.add_argument("--start-date")
    p.add_argument("--end-date")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=_cmd_build_local)

    p = sub.add_parser("configure", help="persist per-cube parameters")
    p.add_argument("datacube")
    p.add_argument("--workdir", required=True)
    p.add_argument("--set", action="append", metavar="KEY=VALUE")
    p.set_defaults(fn=_cmd_configure, parser=p)

    p = sub.add_parser("show-parameters",
                       help="display a cube's parameters")
    p.add_argument("datacube")
    p.add_argument("--workdir", required=True)
    p.set_defaults(fn=_cmd_show_parameters)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
