"""Download the published ppsurf_50nn torch checkpoint (parity: reference
`models/download_ppsurf_50nn.py`).

Note: the published checkpoint is a PyTorch-Lightning state dict; this
framework trains its own flax parameters (SURVEY.md §5 checkpoint notes) —
the download is provided for reference/conversion tooling.
"""
import os
import urllib.request
import zipfile

URL = "https://www.cg.tuwien.ac.at/research/publications/2024/erler-2024-ppsurf/erler-2024-ppsurf-ppsurf_50nn.zip"


def main():
    target_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(target_dir, "ppsurf_50nn.zip")
    print(f"downloading {URL}")
    urllib.request.urlretrieve(URL, zip_path)
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(target_dir)
    os.remove(zip_path)
    print("done")


if __name__ == "__main__":
    main()
