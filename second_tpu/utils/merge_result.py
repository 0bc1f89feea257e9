"""Merge two directories of per-frame KITTI result .txt files.

Behavioral port of second/utils/merge_result.py:5-17: for every
NNNNNN.txt in path1, concatenate its lines with the same-named file in
path2 (blank line between when the first is non-empty) and write the
result to output_path. Useful for combining detections from two models
(e.g. a car model and a people model) into one submission.
"""

import re
import sys
from pathlib import Path


def merge(path1, path2, output_path):
    out = Path(output_path)
    out.mkdir(parents=True, exist_ok=True)
    prog = re.compile(r"^\d{6}\.txt$")
    for fp1 in sorted(Path(path1).glob("*.txt")):
        if not prog.match(fp1.name):
            continue
        contents = fp1.read_text().splitlines(keepends=True)
        if contents:
            contents.append("\n")
        fp2 = Path(path2) / fp1.name
        contents += fp2.read_text().splitlines(keepends=True)
        (out / fp1.name).write_text("".join(contents))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3:
        print("usage: python -m second_tpu.utils.merge_result "
              "PATH1 PATH2 OUTPUT_PATH", file=sys.stderr)
        return 2
    merge(*argv)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
