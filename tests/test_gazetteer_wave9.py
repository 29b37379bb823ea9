"""Round-5 wave-9: structure grammars for extension-less build files.

Real repositories are full of Dockerfiles and Makefiles; the
extension-keyed router silently skipped them (no extension → not even
scanned), while the reference's extraction reads every file it is given
(parsers/pdf_parser.py:587-599).  Wave 9 adds:

- a **docker** grammar: base image → import (join-safe stem — last path
  segment, tag/digest stripped; `scratch` excluded), `FROM … AS stage`
  → class, ARG/ENV names → method owned by the current stage (function
  before the first FROM / after an unnamed stage);
- a **make** grammar: `include x.mk` → import (stem), col-0 variable
  assignments (incl. `export`/`override` prefixes) and `define` macro
  blocks → class, col-0 rule targets → function.  Declared envelope:
  recipe/continuation lines can't match the col-0 anchors, dot-special
  targets (.PHONY), `%.o` pattern rules, path-ish targets (`build/app`
  — not join-safe) and multi-target lines are skipped; define..endef
  bodies are blanked before matching;
- basename routing: the lang expression takes the basename's last
  dot-segment, so a dotless `Dockerfile`/`Makefile` routes via the
  lowercased-basename EXT_LANG keys, and the default glob admits the
  dotless names explicitly.
"""

from __future__ import annotations

from scrapontologies_spark.functions.code_gazetteer import extract_mentions


def _rows(lang, text):
    return [(m["kind"], m["name"], m["owner"])
            for m in extract_mentions(lang, text)]


DOCKER = (
    "# build stage\n"
    "FROM ghcr.io/acme/node:20-slim AS builder\n"
    "ARG VERSION=1.0\n"
    "ENV NODE_ENV=production\n"
    "RUN npm ci && npm run build\n"
    "\n"
    "FROM nginx:1.25@sha256:abc123 AS runtime\n"
    "ENV PORT=8080\n"
    "COPY --from=builder /app/dist /usr/share/nginx/html\n"
    "\n"
    "FROM scratch\n"
    "ARG GLOBALISH\n"
)


def test_dockerfile_stages_images_and_args():
    assert _rows("docker", DOCKER) == [
        ("import", "node", ""),
        ("class", "builder", ""),
        ("method", "VERSION", "builder"),
        ("method", "NODE_ENV", "builder"),
        ("import", "nginx", ""),
        ("class", "runtime", ""),
        ("method", "PORT", "runtime"),
        ("function", "GLOBALISH", ""),   # after the unnamed scratch stage
    ]


def test_dockerfile_case_insensitive_and_comments():
    src = "# from fake AS nope\nfrom alpine:3.20 as base\nenv K=v\n"
    assert _rows("docker", src) == [
        ("import", "alpine", ""),
        ("class", "base", ""),
        ("method", "K", "base"),
    ]


MAKE = (
    "include common.mk\n"
    "-include local/extra.mk\n"
    "\n"
    "CC := gcc\n"
    "CFLAGS = -O2 -Wall\n"
    "export DESTDIR = /usr\n"
    "override LDFLAGS += -lm\n"
    "\n"
    ".PHONY: all clean\n"
    "all: build/app\n"
    "\n"
    "build/app: main.o\n"
    "\t$(CC) -o $@ $^\n"
    "\n"
    "clean::\n"
    "\trm -f *.o\n"
    "\n"
    "define HELP_TEXT\n"
    "usage: make all\n"
    "fake_target: not real\n"
    "endef\n"
    "\n"
    "%.o: %.c\n"
    "\t$(CC) -c $<\n"
)


def test_makefile_vars_targets_includes():
    assert _rows("make", MAKE) == [
        ("import", "common", ""),
        ("import", "extra", ""),
        ("class", "CC", ""),
        ("class", "CFLAGS", ""),
        ("class", "DESTDIR", ""),        # export-prefixed
        ("class", "LDFLAGS", ""),        # override-prefixed
        ("function", "all", ""),
        ("function", "clean", ""),       # double-colon rule
        ("class", "HELP_TEXT", ""),      # define block; body masked
    ]


def test_makefile_recipe_and_pattern_lines_are_inert():
    rows = _rows("make", MAKE)
    names = [r[1] for r in rows]
    assert "PHONY" not in names and ".PHONY" not in names
    assert "fake_target" not in names    # define body
    assert not any("%" in n for n in names)


def test_makefile_var_colon_forms():
    src = "A = 1\nB := 2\nC ?= 3\nD += 4\nE ::= 5\n"
    assert _rows("make", src) == [
        ("class", x, "") for x in "ABCDE"
    ]
    # none of these are targets
    assert all(k == "class" for k, _, _ in _rows("make", src))


def test_basename_routing_in_ext_lang():
    from scrapontologies_spark.sources.files import EXT_LANG, _default_glob

    assert EXT_LANG["dockerfile"] == "docker"
    assert EXT_LANG["makefile"] == "make"
    assert EXT_LANG["mk"] == "make"
    glob = _default_glob(EXT_LANG)
    for name in ("Dockerfile", "Makefile", "GNUmakefile"):
        assert name in glob


def test_corpus_from_files_routes_dotless_basenames(tmp_path, spark):
    (tmp_path / "Dockerfile").write_text("FROM alpine:3 AS base\nENV K=v\n")
    (tmp_path / "Makefile").write_text("CC := gcc\nall:\n\techo hi\n")
    (tmp_path / "app.py").write_text("def f(x):\n    return x\n")
    from scrapontologies_spark.sources.files import corpus_from_files

    df = corpus_from_files(spark, str(tmp_path), repo="r", commit="c")
    got = {r.path: r.lang for r in df.collect()}
    assert got == {"Dockerfile": "docker", "Makefile": "make",
                   "app.py": "python"}


# --- BuildKit heredocs (wave 9b) --------------------------------------------


def test_docker_run_heredoc_body_is_masked():
    src = (
        "FROM alpine:3.20 AS base\n"
        "RUN <<EOF\n"
        "apk add curl\n"
        "ENV GHOST=1\n"
        "FROM ghostimg\n"
        "EOF\n"
        "ENV REAL=2\n"
    )
    # the body's ENV/FROM-shaped lines are data, and the phantom FROM
    # must not reset stage tracking: REAL stays owned by `base`
    assert _rows("docker", src) == [
        ("import", "alpine", ""),
        ("class", "base", ""),
        ("method", "REAL", "base"),
    ]


def test_docker_copy_heredoc_masks():
    src = (
        "FROM alpine AS b\n"
        "COPY <<CFG /etc/app.conf\n"
        "key: value\n"
        "ARG GHOST\n"
        "CFG\n"
        "ARG REAL\n"
    )
    assert _rows("docker", src) == [
        ("import", "alpine", ""),
        ("class", "b", ""),
        ("method", "REAL", "b"),
    ]
