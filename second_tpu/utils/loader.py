"""Dynamic module import (reference second/utils/loader.py:38):
load a python file as a module so custom nets/datasets can register
themselves into the framework registries."""

import importlib.util
import sys
import uuid
from pathlib import Path


def import_file(path, name=None, add_to_sys=True):
    path = Path(path)
    if name is None:
        name = path.stem + "_" + uuid.uuid4().hex[:8]
    spec = importlib.util.spec_from_file_location(name, str(path))
    module = importlib.util.module_from_spec(spec)
    if add_to_sys:
        sys.modules[name] = module
    spec.loader.exec_module(module)
    return module
