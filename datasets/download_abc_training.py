"""Download the ABC var-noise training set (parity: reference
`datasets/download_abc_training.py`). Zero-egress environments can place
the extracted dataset at datasets/abc_train/ manually."""
import os
import urllib.request
import zipfile

URL = "https://www.cg.tuwien.ac.at/research/publications/2024/erler-2024-ppsurf/erler-2024-ppsurf-abc_train.zip"


def main():
    target_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(target_dir, "abc_train.zip")
    if not os.path.isdir(os.path.join(target_dir, "abc_train")):
        print(f"downloading {URL}")
        urllib.request.urlretrieve(URL, zip_path)
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(target_dir)
        os.remove(zip_path)
    print("done")


if __name__ == "__main__":
    main()
