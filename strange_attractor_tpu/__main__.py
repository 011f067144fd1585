"""``python -m strange_attractor_tpu`` entry point."""

from .cli import main

raise SystemExit(main())
