"""Dataset download helper (reference surface: utils/downloader.py:8-31)."""

import os
from urllib.request import urlretrieve


def show_progress(blk_num, blk_sz, tot_sz):
    percentage = 100.0 * blk_num * blk_sz / tot_sz if tot_sz > 0 else 0.0
    print("Progress: %.1f %%" % min(percentage, 100.0), end="\r", flush=True)


def download_url(url, file_path):
    """Download ``url`` to ``file_path``, creating directories and skipping
    the fetch if the file already exists. Raises on network failure (callers
    decide whether to fall back, e.g. to synthetic data)."""
    directory = os.path.dirname(file_path)
    if directory and not os.path.exists(directory):
        os.makedirs(directory, exist_ok=True)
    if os.path.exists(file_path):
        print("%s already exists." % file_path)
        return file_path
    print("Downloading %s ..." % url)
    urlretrieve(url, file_path, show_progress)
    print("\nSaved to %s." % file_path)
    return file_path
