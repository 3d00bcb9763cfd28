"""Make the in-repo package importable when examples run uninstalled."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
