import sys

from genome_downsampler_tpu.cli.main import main

sys.exit(main())
