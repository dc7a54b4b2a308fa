"""Download the 14 test datasets (parity: reference
`datasets/download_testsets.py`)."""
import os
import urllib.request
import zipfile

BASE = "https://www.cg.tuwien.ac.at/research/publications/2024/erler-2024-ppsurf/"
ZIPS = ["erler-2024-ppsurf-testsets.zip"]


def main():
    target_dir = os.path.dirname(os.path.abspath(__file__))
    for name in ZIPS:
        zip_path = os.path.join(target_dir, name)
        print(f"downloading {BASE + name}")
        urllib.request.urlretrieve(BASE + name, zip_path)
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(target_dir)
        os.remove(zip_path)
    print("done")


if __name__ == "__main__":
    main()
