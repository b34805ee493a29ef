from upton_ray.cli import main

raise SystemExit(main())
