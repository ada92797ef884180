"""``python -m flashpca_tpu`` == the flashpca-compatible CLI.

(The installed console script -- pyproject [project.scripts] -- and
``python -m flashpca_tpu.cli`` are the other two spellings.)
"""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
