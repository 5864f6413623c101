"""Filesystem crawler: glob walk + extension filter.

Replicates the reference crawler's discovery semantics
(src/crawler.rs:35-65): each tracked folder glob gets ``/**/*.*`` appended,
matches are filtered to the 12 supported image extensions
(case-insensitive), and results stream to the decode pool.

The reference runs this on a dedicated thread feeding an unbounded channel
(crawler.rs:27); here it is a generator the pipeline drains from its own
walker thread — same topology, Python idiom.
"""

from __future__ import annotations

import glob as globlib
import os
from typing import Iterable, Iterator, List

from pixelbox_tpu.ingest.decode import is_supported_image


def expand_folder_glob(folder: str) -> str:
    """Append ``/**/*.*`` like the reference (crawler.rs:36-40)."""
    return os.path.join(folder, "**", "*.*")


def crawl(folders: Iterable[str]) -> Iterator[str]:
    """Yield supported image file paths under the tracked folder globs."""
    for folder in folders:
        pattern = expand_folder_glob(folder)
        for path in globlib.iglob(pattern, recursive=True):
            if os.path.isfile(path) and is_supported_image(path):
                yield path


def crawl_list(folders: Iterable[str]) -> List[str]:
    return list(crawl(folders))
