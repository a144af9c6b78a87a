"""Path bootstrap so experiment scripts run standalone
(``python examples/<x>/train.py``) like the reference's PYTHONPATH setup
(sbatch.sh:97)."""
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))
