from .shipper import main

raise SystemExit(main())
