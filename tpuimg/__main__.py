import sys

from tpuimg.cli import main

sys.exit(main())
