"""Dataset downloaders (reference get_dataset.py:13-93).

Kaggle (padel-ball detection/tracknet data) and Roboflow (yolov5-format
exports), credential-driven via .env. The kaggle/roboflow/dotenv packages are
optional — import errors surface as actionable messages instead of hard
crashes, and the download layout matches the reference:
data/<dtype>/{train,valid}/ with images+labels side by side.
"""
import argparse
import glob
import logging
import os
import shutil

logger = logging.getLogger(__name__)
LOG_FORMAT = "%(asctime)s %(levelname)s %(filename)s: %(message)s"


def _load_dotenv():
    try:
        from dotenv import load_dotenv
        load_dotenv()
    except ImportError:
        logger.warning("python-dotenv not installed; relying on process env vars")


class KagglePadelBallDataDownloader:
    """Downloads the padel-ball dataset from Kaggle and arranges
    padel/ images + new_annotations/ labels into data/<dtype>/{train,valid}."""

    def __init__(self, dataset: str, dtype: str = "detection", data_dir: str = "data"):
        self.dataset = dataset
        self.dtype = dtype
        self.data_dir = data_dir

    def download(self, train_split: float = 0.8):
        _load_dotenv()
        try:
            import kaggle
        except Exception as e:
            raise ImportError(
                "kaggle package (and KAGGLE_USERNAME/KAGGLE_KEY credentials) "
                "required for Kaggle downloads") from e
        tmp = os.path.join(self.data_dir, "_kaggle_tmp")
        kaggle.api.dataset_download_files(self.dataset, path=tmp, unzip=True)
        self.arrange(tmp, train_split)

    def arrange(self, tmp: str, train_split: float = 0.8):
        """Split the unpacked padel/ images + new_annotations/ labels into
        data/<dtype>/{train,valid} (offline-testable half of download())."""
        imgs = sorted(glob.glob(os.path.join(tmp, "padel", "**", "*.*"), recursive=True))
        labels = sorted(glob.glob(os.path.join(tmp, "new_annotations", "**", "*.txt"),
                                  recursive=True))
        n_train = int(len(imgs) * train_split)
        for split, lo, hi in [("train", 0, n_train), ("valid", n_train, len(imgs))]:
            dest = os.path.join(self.data_dir, self.dtype, split)
            os.makedirs(dest, exist_ok=True)
            for f in imgs[lo:hi] + labels[lo:hi]:
                shutil.copy(f, dest)
        shutil.rmtree(tmp, ignore_errors=True)
        logger.info(f"dataset arranged under {os.path.join(self.data_dir, self.dtype)}")


class RoboFlowDataDownloader:
    """Downloads a yolov5-format export from Roboflow."""

    def __init__(self, workspace: str, project: str, version: int,
                 dtype: str = "detection", data_dir: str = "data"):
        self.workspace = workspace
        self.project = project
        self.version = version
        self.dtype = dtype
        self.data_dir = data_dir

    def download(self):
        _load_dotenv()
        try:
            from roboflow import Roboflow
        except Exception as e:
            raise ImportError(
                "roboflow package (and ROBOFLOW_API_KEY) required") from e
        rf = Roboflow(api_key=os.environ["ROBOFLOW_API_KEY"])
        project = rf.workspace(self.workspace).project(self.project)
        dest = os.path.join(self.data_dir, self.dtype)
        project.version(self.version).download("yolov5", location=dest)
        logger.info(f"dataset downloaded to {dest}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format=LOG_FORMAT)
    parser = argparse.ArgumentParser(description="Dataset downloader")
    parser.add_argument("--source", choices=["kaggle", "roboflow"], required=True)
    parser.add_argument("--dataset", type=str, default="", help="kaggle dataset slug")
    parser.add_argument("--workspace", type=str, default="", help="roboflow workspace")
    parser.add_argument("--project", type=str, default="", help="roboflow project")
    parser.add_argument("--version", type=int, default=1, help="roboflow version")
    parser.add_argument("--dtype", type=str, default="detection",
                        help="data type folder (detection/segmentation/tracknet)")
    args = parser.parse_args()
    _load_dotenv()
    if args.source == "kaggle":
        KagglePadelBallDataDownloader(args.dataset, dtype=args.dtype).download()
    else:
        # reference reads RoboFlow details from .env (readme.md:10-20)
        workspace = args.workspace or os.environ.get("ROBOFLOW_WORKSPACE", "")
        project = args.project or os.environ.get("ROBOFLOW_PROJECT", "")
        version = args.version or int(os.environ.get("VERSION", 1))
        RoboFlowDataDownloader(workspace, project, version, dtype=args.dtype).download()
