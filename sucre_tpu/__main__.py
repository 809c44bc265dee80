from sucre_tpu.cli import main

raise SystemExit(main())
