"""Per-partition bridge between Spark's pipe() line protocol and the
reference framework's file-based Python UDF contract.

The reference executes user map/reduce code as Python functions taking
an input FILE PATH and returning a dict (``mapfunc(in_file)`` /
``reducefunc(in_file)`` — w7/src/worker/workerimpl.cc:143-247 embeds
the interpreter; w6/docs/design.md:66-74 is the POST-two-.py-files
submission ideal). Spark's pipe() instead streams the partition's rows
over stdin and collects stdout lines. This shim adapts one to the
other so a user's .py runs UNMODIFIED:

  stdin rows -> temp file -> user fn(temp file) -> "key:value" stdout

Usage (constructed by graft.api.PyJob, never by hand):
  python3 pyshim.py map    /abs/path/mapper.py
  python3 pyshim.py reduce /abs/path/reducer.py

The user function's dict is emitted as ``key:value`` lines — the
reference's wire format (split on the LAST colon when read back, so
keys may contain ':', values must not).
"""
import importlib.util
import os
import sys
import tempfile


def main():
    mode, module_path = sys.argv[1], sys.argv[2]
    fd, tmp = tempfile.mkstemp(prefix="graft_py_", suffix=".txt")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as w:
            for line in sys.stdin:
                w.write(line if line.endswith("\n") else line + "\n")
        spec = importlib.util.spec_from_file_location("graft_user_udf", module_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn = mod.mapfunc if mode == "map" else mod.reducefunc
        result = fn(tmp)
        out = sys.stdout
        for k, v in result.items():
            k, v = str(k), str(v)
            # wire-format guard: the downstream read splits lines on the
            # LAST colon (w7/src/python/reduce.py:9 rsplit), so keys may
            # contain ':' but values must not, and neither may contain a
            # newline (the format is line-delimited). Emitting anyway
            # would silently corrupt adjacent pairs — fail the task loudly
            # instead and let the user fix the UDF.
            if "\n" in k or "\n" in v:
                raise ValueError(
                    "key/value must not contain newlines "
                    f"(key:value wire format is line-delimited): {k!r} -> {v!r}")
            if ":" in v:
                raise ValueError(
                    "value must not contain ':' (the read side splits on "
                    f"the LAST colon, so a colon in the value shifts the key): {v!r}")
            out.write(f"{k}:{v}\n")
    finally:
        os.unlink(tmp)


if __name__ == "__main__":
    main()
