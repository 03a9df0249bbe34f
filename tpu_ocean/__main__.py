from tpu_ocean.demo import main
import sys

sys.exit(main())
