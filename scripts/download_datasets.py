"""Dataset download tooling — counterpart of the reference's
``lavis/datasets/download_scripts/`` (download_coco.py, download_flickr.py,
download_gqa.py, download_msrvtt.py, download_msvd.py, download_didemo.py,
download_nocaps.py, download_sbu.py, download_vg.py), consolidated into one
CLI with per-dataset entries.

Flow per dataset (mirrors the reference scripts): resolve the storage dirs
from ``configs/datasets/<name>/defaults.yaml`` (relative paths land under
the cache root, like the reference's cache_root), download the archives,
extract, move into place, clean up. Archives whose hosts require manual
URL extraction (MSRVTT/MSVD mediafire links — see the reference's TODO
blocks) take ``--url split=URL`` overrides.

    python scripts/download_datasets.py coco
    python scripts/download_datasets.py msrvtt \
        --url train=https://... --url test=https://...
    python scripts/download_datasets.py --list

Zero-egress environments: the script verifies reachability first and
exits with a clear message instead of hanging.
"""

import argparse
import os
import shutil
import sys
import tarfile
import urllib.error
import urllib.request
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mr_blip_tpu.common.config import load_yaml  # noqa: E402
from mr_blip_tpu.common.utils import get_cache_path, makedir  # noqa: E402

# name -> (config name, media key, {split: archive url})
# URLs follow the reference scripts; None = must be passed via --url
# (host requires a browser step, e.g. mediafire).
DATASETS = {
    "coco": ("coco_caption", "images", {
        "train2014": "http://images.cocodataset.org/zips/train2014.zip",
        "val2014": "http://images.cocodataset.org/zips/val2014.zip",
        "test2014": "http://images.cocodataset.org/zips/test2014.zip",
        "test2015": "http://images.cocodataset.org/zips/test2015.zip",
    }),
    "flickr": ("flickr30k", "images", {
        # Kaggle-hosted: needs an authenticated browser download
        "images": None,
    }),
    "gqa": ("gqa", "images", {
        "images": "https://downloads.cs.stanford.edu/nlp/data/gqa/images.zip",
    }),
    "msrvtt": ("msrvtt_caption", "videos", {
        "train": None,  # mediafire: copy the direct link per reference TODO
        "test": None,
    }),
    "msvd": ("msvd_caption", "videos", {
        "videos": None,  # mediafire
    }),
    "didemo": ("didemo_retrieval", "videos", {
        "videos": None,  # LisaAnne/LocalizingMoments release
    }),
    "nocaps": ("nocaps", "images", {
        # images come from Open Images; annotations are nocaps JSONs
        "val": "https://nocaps.s3.amazonaws.com/nocaps_val_4500_captions.json",
        "test": "https://nocaps.s3.amazonaws.com/nocaps_test_image_info.json",
    }),
    "sbu": ("sbu_caption", "images", {
        "captions": "https://www.cs.rice.edu/~vo9/sbucaptions/sbu-captions-all.tar.gz",
    }),
    "vg": ("vg_caption", "images", {
        "part1": "https://cs.stanford.edu/people/rak248/VG_100K/images.zip",
        "part2": "https://cs.stanford.edu/people/rak248/VG_100K_2/images2.zip",
    }),
}


def storage_dir(config_name: str, media_key: str) -> str:
    cfg_path = os.path.join(REPO, "configs", "datasets", config_name,
                            "defaults.yaml")
    cfg = load_yaml(cfg_path)["datasets"]
    cfg = next(iter(cfg.values()))
    path = cfg["build_info"][media_key]["storage"]
    if not os.path.isabs(path):
        path = get_cache_path(path)
    return path


def check_reachable(url: str, timeout: float = 10.0) -> bool:
    try:
        req = urllib.request.Request(url, method="HEAD")
        urllib.request.urlopen(req, timeout=timeout)
        return True
    except (urllib.error.URLError, TimeoutError, OSError):
        return False


def download(url: str, dest: str):
    print(f"downloading {url} -> {dest}", flush=True)
    makedir(os.path.dirname(dest))
    tmp = dest + ".part"
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f, length=1 << 20)
    os.replace(tmp, dest)


def extract(archive: str, into: str):
    makedir(into)
    if archive.endswith(".zip"):
        with zipfile.ZipFile(archive) as z:
            z.extractall(into)
    elif archive.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(archive) as t:
            t.extractall(into)
    else:  # plain file (e.g. a json): move into place
        shutil.copy(archive, into)


def run(name: str, url_overrides: dict, keep_archives: bool):
    config_name, media_key, urls = DATASETS[name]
    urls = {**urls, **url_overrides}
    missing = [s for s, u in urls.items() if not u]
    if missing:
        raise SystemExit(
            f"{name}: split(s) {missing} need --url <split>=<direct-url> "
            "(host requires a manual browser step; see the reference "
            "download script's TODO)"
        )
    dest_dir = storage_dir(config_name, media_key)
    if os.path.isdir(dest_dir) and os.listdir(dest_dir):
        print(f"{name}: {dest_dir} already populated; skipping")
        return
    probe = next(iter(urls.values()))
    if not check_reachable(probe):
        raise SystemExit(
            f"{name}: {probe} unreachable — no network egress from this "
            "host? Download the archives elsewhere and extract into "
            f"{dest_dir}"
        )
    stage = os.path.join(dest_dir + "_download")
    makedir(stage)
    for split, url in urls.items():
        archive = os.path.join(stage, os.path.basename(url.split("?")[0]))
        if not os.path.exists(archive):
            download(url, archive)
        extract(archive, dest_dir)
        if not keep_archives:
            os.remove(archive)
    if not keep_archives:
        shutil.rmtree(stage, ignore_errors=True)
    print(f"{name}: ready at {dest_dir}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", nargs="?", choices=sorted(DATASETS))
    ap.add_argument("--url", action="append", default=[],
                    metavar="SPLIT=URL",
                    help="override/provide an archive url for a split")
    ap.add_argument("--keep-archives", action="store_true")
    ap.add_argument("--list", action="store_true",
                    help="list datasets and their target storage dirs")
    args = ap.parse_args()
    if args.list or not args.dataset:
        for name, (cfg, media, urls) in sorted(DATASETS.items()):
            manual = [s for s, u in urls.items() if not u]
            note = f" (manual url needed: {manual})" if manual else ""
            print(f"{name:10s} -> {storage_dir(cfg, media)}{note}")
        return
    overrides = dict(u.split("=", 1) for u in args.url)
    run(args.dataset, overrides, args.keep_archives)


if __name__ == "__main__":
    main()
