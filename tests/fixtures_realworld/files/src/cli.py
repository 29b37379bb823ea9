"""CLI entry point for the tracker."""

import argparse
import sys

from tracker import load_tracker, render_summary


def build_parser():
    parser = argparse.ArgumentParser(prog="tracker")
    parser.add_argument("command", choices=("list", "add", "done"))
    parser.add_argument("--db", default="tasks.jsonl")
    return parser


async def watch(path, interval=2.0):
    while True:
        refresh(path)


def main(argv=None):
    args = build_parser().parse_args(argv)
    tracker = load_tracker(args.db)
    if args.command == "list":
        render_summary(tracker)
        return 0
    print("unsupported:", args.command, file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
