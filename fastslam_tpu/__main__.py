from fastslam_tpu.app.cli import main

raise SystemExit(main())
