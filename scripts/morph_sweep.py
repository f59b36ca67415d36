import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuimg.cli import main
main(["sweep", "morphology", "--radii", "1-30", "--nreps", "15", "--plot",
      "--out-dir", os.path.join(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))), "docs")])
