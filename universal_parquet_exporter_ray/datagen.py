"""Deterministic synthetic ``source_files`` table generator (FIXTURES.md §1).

The north-rule input shape (``BASELINE.json`` input_hint):
``(repo: string, path: string, commit: string, lang: string, content: string)``.
Zipf-skewed repo sizes make repo 0 a "monorepo" hot key (the salted-shuffle
skew fixture); ~5% exact-duplicate contents; unicode + embedded quotes mirror
the reference's special-char tests
(``/root/reference/tests/test_query_executor_realDB.py:273-297``).

Seed fixed (42); no wall clock — identical output across processes/rounds.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "c", "cpp", "java", "js", "go", "rs", "md"]
LANG_WEIGHTS = [0.30, 0.10, 0.10, 0.15, 0.15, 0.08, 0.07, 0.05]

_DIR_VOCAB = [
    "src", "lib", "core", "util", "io", "net", "db", "api", "cli", "gui",
    "test", "docs", "internal", "pkg", "cmd", "server", "client", "common",
    "base", "data", "model", "view", "ctrl", "auth", "cache", "queue",
    "log", "conf", "build", "tools", "ext", "plugin", "proto", "rpc",
    "http", "json", "xml", "codec", "hash", "math", "time", "fs", "mem",
    "sync", "async", "worker", "sched", "pool", "buf", "str",
]

_KEYWORDS = {
    "py": ["def", "return", "import", "class", "self", "if", "else", "for", "in", "None", "True", "lambda", "yield", "with", "try", "except"],
    "c": ["int", "char", "void", "return", "struct", "static", "const", "if", "else", "for", "while", "sizeof", "#include", "typedef"],
    "cpp": ["template", "class", "public:", "private:", "std::", "auto", "const", "return", "namespace", "virtual", "override", "nullptr"],
    "java": ["public", "private", "static", "void", "class", "return", "new", "final", "extends", "implements", "throws", "@Override"],
    "js": ["function", "const", "let", "return", "async", "await", "export", "import", "=>", "this", "new", "typeof"],
    "go": ["func", "return", "package", "import", "type", "struct", "interface", "defer", "go", "chan", "range", "nil"],
    "rs": ["fn", "let", "mut", "impl", "pub", "struct", "enum", "match", "return", "use", "&self", "Option", "Result"],
    "md": ["#", "##", "the", "a", "is", "see", "and", "for", "usage", "example", "note", "install", "build", "run"],
}

_OPERATORS = ["=", "==", "+", "-", "*", "(", ")", "{", "}", "[", "]", ";", ",", ".", "->", "&&", "||", "<", ">"]

# unicode comments + embedded quotes (reference special-char parity)
_COMMENTS = [
    "// TODO: fix this — naïve implementation",
    "# héllo wörld: handles O'Connor & \"quoted\" input",
    "/* 你好 & ünïcode + edge-cases */",
    "// R&D + perf: don't touch",
]


def _identifiers(rng: np.random.Generator, n: int = 2000) -> list[str]:
    syll = ["read", "write", "buf", "idx", "tmp", "val", "node", "item", "ptr",
            "len", "cnt", "pos", "key", "map", "arr", "obj", "ctx", "cfg",
            "req", "res", "msg", "pkt", "row", "col", "tab", "rec", "fld"]
    out = []
    for _ in range(n):
        parts = rng.choice(syll, rng.integers(1, 4))
        out.append("_".join(parts) + str(rng.integers(0, 100)))
    return out


def generate_source_files(
    rows: int, seed: int = 42, n_repos: int | None = None, dup_frac: float = 0.05
) -> pa.Table:
    rng = np.random.default_rng(seed)
    if n_repos is None:
        n_repos = max(4, rows // 500)

    # zipf-ish repo sizes: weight ∝ 1/rank^1.5, repo 0 = monorepo hot key
    ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    w = 1.0 / ranks**1.5
    w /= w.sum()
    repo_idx = rng.choice(n_repos, size=rows, p=w)
    # object dtype: fixed-width numpy U-arrays silently truncate later writes
    repos = np.array([f"org{i % 17}/repo{i}" for i in range(n_repos)], dtype=object)[
        repo_idx
    ]

    langs = rng.choice(LANGS, size=rows, p=LANG_WEIGHTS)

    dirs = rng.choice(_DIR_VOCAB, size=(rows, 3))
    depth = rng.integers(1, 4, size=rows)
    fnames = rng.integers(0, 1000, size=rows)
    paths = np.array(
        [
            "/".join(dirs[i, : depth[i]]) + f"/file_{fnames[i]:04d}.{langs[i]}"
            for i in range(rows)
        ]
    )

    commit_bytes = rng.integers(0, 256, size=(rows, 20), dtype=np.uint8)
    commits = np.array([bytes(c).hex() for c in commit_bytes])

    idents = _identifiers(rng)
    lengths = np.clip(rng.lognormal(5.5, 1.0, size=rows), 64, 65536).astype(np.int64)
    contents = np.empty(rows, dtype=object)
    for i in range(rows):
        kw = _KEYWORDS[langs[i]]
        target = lengths[i]
        toks = []
        sz = 0
        while sz < target:
            r = rng.random()
            if r < 0.4:
                t = kw[rng.integers(0, len(kw))]
            elif r < 0.75:
                t = idents[rng.integers(0, len(idents))]
            elif r < 0.95:
                t = _OPERATORS[rng.integers(0, len(_OPERATORS))]
            else:
                t = _COMMENTS[rng.integers(0, len(_COMMENTS))] + "\n"
            toks.append(t)
            sz += len(t) + 1
        contents[i] = " ".join(toks)

    # ~dup_frac exact duplicates (vendored-file realism)
    n_dup = int(rows * dup_frac)
    if n_dup and rows > 1:
        dst = rng.choice(rows, size=n_dup, replace=False)
        src = rng.choice(rows, size=n_dup)
        contents[dst] = contents[src]

    # edge-case slices (FIXTURES.md): empty content, all-null lang block,
    # single-row repo, one pure-constant-content repo
    if rows >= 20:
        contents[0] = ""
        langs_arr = langs.astype(object)
        langs_arr[1:4] = None
        repos[5] = "org0/lonely_repo"
        repos[6:10] = "org0/constant_repo"
        contents[6:10] = "# identical vendored file\n"
        lang_col = pa.array(langs_arr, type=pa.string())
    else:
        lang_col = pa.array(langs, type=pa.string())

    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": lang_col,
            "content": pa.array(contents, type=pa.string()),
        }
    )


def write_source_files(
    path: str, rows: int, seed: int = 42, row_group_size: int = 50_000
) -> str:
    """Generate-and-cache the fixture as Parquet; returns the path."""
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        t = generate_source_files(rows, seed=seed)
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(t, tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
    return path


def write_source_files_parallel(
    dir_path: str, rows: int, seed: int = 42, chunk_rows: int = 200_000
) -> str:
    """Large fixtures: generate deterministic chunks as parallel Ray tasks
    into a DIRECTORY of parquet files (chunk i uses seed+i, so output is
    identical regardless of parallelism). Requires an initialised Ray."""
    done_marker = os.path.join(dir_path, "_DONE")
    if os.path.exists(done_marker):
        return dir_path
    import ray

    os.makedirs(dir_path, exist_ok=True)

    @ray.remote
    def gen_chunk(i: int, n: int) -> str:
        p = os.path.join(dir_path, f"chunk_{i:04d}.parquet")
        if not os.path.exists(p):
            t = generate_source_files(n, seed=seed + i)
            tmp = p + f".tmp{os.getpid()}"
            pq.write_table(t, tmp, row_group_size=50_000)
            os.replace(tmp, p)
        return p

    n_chunks = -(-rows // chunk_rows)
    sizes = [chunk_rows] * (n_chunks - 1) + [rows - chunk_rows * (n_chunks - 1)]
    ray.get([gen_chunk.remote(i, n) for i, n in enumerate(sizes)])
    with open(done_marker, "w") as f:
        f.write(str(rows))
    return dir_path
