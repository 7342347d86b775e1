"""``python -m texoo_ray`` — the job entry point (`ray job submit --
python -m texoo_ray annotate ...`); delegates to :mod:`texoo_ray.cli`."""

import sys

from .cli import main

sys.exit(main())
