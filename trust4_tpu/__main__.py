from trust4_tpu.cli import main

raise SystemExit(main())
