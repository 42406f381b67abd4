#!/usr/bin/env python
"""WordNet-synset-dir -> ImageNet class-index lookup (reference
``scripts/visualization/imagenet_dict.py``).  Reads the synset list from a
local ``imagenet.txt`` (one ``nXXXXXXXX label`` per line, class order)."""

import os
from typing import Dict

_DEFAULT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "imagenet.txt")


def load_synset_index(path: str = _DEFAULT) -> Dict[str, int]:
    mapping: Dict[str, int] = {}
    if not os.path.exists(path):
        return mapping
    with open(path) as f:
        for idx, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            synset = line.split()[0]
            mapping[synset] = idx
    return mapping


def class_index(wordnet_dir: str, path: str = _DEFAULT) -> int:
    mapping = load_synset_index(path)
    synset = os.path.basename(wordnet_dir.rstrip("/"))
    if synset not in mapping:
        raise KeyError(f"{synset} not in {path} ({len(mapping)} entries)")
    return mapping[synset]


if __name__ == "__main__":
    import sys

    print(class_index(sys.argv[1]))
