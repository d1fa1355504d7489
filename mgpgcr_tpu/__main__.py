from mgpgcr_tpu.cli import main

raise SystemExit(main())
