"""Minimal fire.Fire-compatible CLI dispatcher.

The reference exposes its entry points via ``fire.Fire()``
(second/pytorch/train.py:662-663); fire isn't in this image, so this
small shim accepts the same invocation style:

    python -m second_tpu.train train --config_path=... --model_dir=...
    python -m second_tpu.train evaluate --config_path xx --model_dir yy
"""

import ast
import inspect
import sys


def _parse_value(text):
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def fire(funcs, argv=None):
    """funcs: dict name -> callable, or a single callable."""
    argv = list(sys.argv[1:] if argv is None else argv)
    if callable(funcs):
        func = funcs
    else:
        if not argv or argv[0].startswith("-"):
            names = ", ".join(sorted(funcs))
            print(f"usage: <command> [args]; commands: {names}")
            sys.exit(2)
        name = argv.pop(0)
        if name not in funcs:
            names = ", ".join(sorted(funcs))
            print(f"unknown command {name!r}; commands: {names}")
            sys.exit(2)
        func = funcs[name]

    sig = inspect.signature(func)
    params = list(sig.parameters)
    args, kwargs = [], {}
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok.startswith("--"):
            key = tok[2:]
            if "=" in key:
                key, val = key.split("=", 1)
            elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                i += 1
                val = argv[i]
            else:
                val = "True"
            kwargs[key.replace("-", "_")] = _parse_value(val)
        else:
            args.append(_parse_value(tok))
        i += 1
    bad = [k for k in kwargs if k not in params]
    if bad:
        print(f"unknown argument(s) {bad}; expected {params}")
        sys.exit(2)
    return func(*args, **kwargs)
