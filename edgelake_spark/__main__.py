"""Interactive CLI: ``python -m edgelake_spark [--sf-dir DIR] [command]``.

The reference is CLI-first (``edge_lake.EdgeLake`` drops into a command
prompt; member_cmd.py's command tree). This REPL accepts the same
command shapes the engine supports — ``sql <dbms> [options] "SELECT"``,
``run client () …``, blockchain/get/set admin commands — and prints
rendered results. One-shot mode: pass the command as argv.
"""

from __future__ import annotations

import sys


def _render(result) -> str:
    if isinstance(result, str):
        return result
    # DataFrame: default table rendering like the reference CLI
    from edgelake_spark.output import format_result

    return format_result(result, "table")


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    sf_dir = None
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]

    from edgelake_spark import EdgeLakeEngine, get_spark

    spark = get_spark(app_name="edgelake-cli")
    engine = EdgeLakeEngine(spark, sf_dir)

    if argv:  # one-shot
        try:
            print(_render(engine.run(" ".join(argv))))
            return 0
        except Exception as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 1

    print("EdgeLake-Spark CLI — type a command, 'exit' to quit")
    while True:
        try:
            line = input("EL > ").strip()
        except EOFError:
            break
        if not line:
            continue
        if line.lower() in ("exit", "quit"):
            break
        try:
            print(_render(engine.run(line)))
        except Exception as exc:
            print(f"error: {exc}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
