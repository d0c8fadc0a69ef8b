"""Download the published vid2vid assets (datasets, pretrained models).

Mirrors the reference's gdrive fetchers (reference: scripts/download_datasets.py,
scripts/download_models_flownet2.py, scripts/{street,face}/download_models*.py,
scripts/download_gdrive.py) as one CLI:

    python -m vid2vid_tpu.tools.download datasets
    python -m vid2vid_tpu.tools.download models-street
    python -m vid2vid_tpu.tools.download models-street-g1
    python -m vid2vid_tpu.tools.download models-face
    python -m vid2vid_tpu.tools.download flownet2

Each asset is a Google-Drive-hosted zip (or .pth.tar); the file ids below
are the published ones from the reference scripts. Downloads use only the
stdlib (urllib with the gdrive confirm-token dance). In an offline
environment this fails fast with the manual URL so the user can fetch the
file elsewhere; `recipes/datasets.md` documents the on-disk layout the
data loaders expect, and `tools/convert_checkpoint.py` converts the torch
checkpoints to native params once present.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

ASSETS = {
    # name: (gdrive file id, destination, unzip?)
    "datasets": ("1rPcbnanuApZeo2uc7h55OneBkbcFCnnf", "datasets/datasets.zip", True),
    "models-street": ("1MKtImgtnGC28EPU7Nh9DfFpHW6okNVkl", "checkpoints/models.zip", True),
    "models-street-g1": ("1QoE1p3QikxNVbbTBWWRDtIspg-RcLE8y", "checkpoints/models_g1.zip", True),
    "models-face": ("10LvNw-2lrh-6sPGkWbQDfHspkqz5AKxb", "checkpoints/models_face.zip", True),
    "flownet2": (
        "1E8re-b6csNuo-abg1vJKCDjCzlIam50F",
        "checkpoints/flownet2/FlowNet2_checkpoint.pth.tar",
        False,
    ),
}

_URL = "https://docs.google.com/uc?export=download&id={id}"


def _download_gdrive(file_id: str, destination: str) -> None:
    """Fetch a gdrive file, following the large-file confirm token."""
    import urllib.request
    from http.cookiejar import CookieJar

    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(CookieJar())
    )
    url = _URL.format(id=file_id)
    with opener.open(url, timeout=60) as resp:
        data = resp.read()
    # small files come straight through; large ones return an HTML page
    # with a confirm token in the download link
    if data[:6] in (b"<!DOCT", b"<html>", b"<html "):
        text = data.decode("utf-8", "replace")
        marker = "confirm="
        start = text.find(marker)
        if start < 0:
            raise RuntimeError("no gdrive confirm token in response")
        token = text[start + len(marker) :].split("&")[0].split('"')[0]
        with opener.open(url + "&confirm=" + token, timeout=600) as resp:
            data = resp.read()
    os.makedirs(os.path.dirname(destination) or ".", exist_ok=True)
    with open(destination, "wb") as f:
        f.write(data)


def fetch(name: str, root: str = ".") -> str:
    file_id, dest, unzip = ASSETS[name]
    dest = os.path.join(root, dest)
    try:
        _download_gdrive(file_id, dest)
    except Exception as e:  # noqa: BLE001 — offline/blocked envs fail fast
        raise SystemExit(
            f"download of {name!r} failed ({e!r}).\n"
            f"Fetch it manually from {_URL.format(id=file_id)}\n"
            f"and place it at {dest}; see recipes/datasets.md for the "
            "expected layout."
        ) from e
    if unzip:
        with zipfile.ZipFile(dest) as zf:
            zf.extractall(os.path.dirname(dest))
    return dest


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("asset", choices=sorted(ASSETS))
    ap.add_argument("--root", default=".", help="repo root to place files under")
    args = ap.parse_args(argv)
    path = fetch(args.asset, args.root)
    print(f"downloaded {args.asset} -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
