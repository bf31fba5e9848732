"""Notebook/HTML output helpers (mirror of
`/root/reference/audiotools/post.py`): audio tables with embedded players,
notebook detection, generic display.

``markdown2`` is not available in this image, so markdown tables are
rendered to HTML with a small native converter.
"""
import typing


def _markdown_table_to_html(table_md: str) -> str:
    """Minimal markdown-table -> HTML conversion (replaces markdown2)."""
    lines = [l for l in table_md.strip().split("\n") if l.strip()]
    if not lines:
        return ""
    rows = []
    for i, line in enumerate(lines):
        cells = [c.strip() for c in line.strip().strip("|").split(" | ")]
        if i == 1 and all(set(c) <= set(":- ") for c in cells):
            continue  # separator row
        tag = "th" if i == 0 else "td"
        rows.append(
            "<tr>" + "".join(f"<{tag}>{c}</{tag}>" for c in cells) + "</tr>"
        )
    return "<table>" + "".join(rows) + "</table>"


def audio_table(
    audio_dict: dict,
    first_column: str = None,
    format_fn: typing.Callable = None,
    **kwargs,
):
    """Markdown table of embedded audio players (reference post.py:12-90).

    >>> audio_dict = {i: {"input": in_sig[i], "output": out_sig[i]}
    ...               for i in range(batch)}
    >>> post.audio_table(audio_dict)
    """
    from . import AudioSignal

    output = []
    columns = None

    def _default_format_fn(label, x, **kwargs):
        import jax.numpy as jnp
        import numpy as np

        if isinstance(x, (np.ndarray, jnp.ndarray)):
            x = np.asarray(x).tolist()

        if x is None:
            return "."
        elif isinstance(x, AudioSignal):
            return x.embed(display=False, return_html=True, **kwargs)
        else:
            return str(x)

    if format_fn is None:
        format_fn = _default_format_fn

    if first_column is None:
        first_column = "."

    for k, v in audio_dict.items():
        if not isinstance(v, dict):
            v = {"Audio": v}

        v_keys = list(v.keys())
        if columns is None:
            columns = [first_column] + v_keys
            output.append(" | ".join(columns))

            layout = "|---" + len(v_keys) * "|:-:"
            output.append(layout)

        formatted_audio = []
        for col in columns[1:]:
            formatted_audio.append(format_fn(col, v[col], **kwargs))

        row = f"| {k} | "
        row += " | ".join(formatted_audio)
        output.append(row)

    output = "\n" + "\n".join(output)
    return output


def in_notebook():
    """Whether code is running in a notebook (reference post.py:93-109)."""
    try:
        from IPython import get_ipython

        if "IPKernelApp" not in get_ipython().config:
            return False
    except ImportError:
        return False
    except AttributeError:
        return False
    return True


def disp(obj, **kwargs):
    """Display an object appropriately for notebook/terminal
    (reference post.py:112-140)."""
    import matplotlib.pyplot as plt

    from . import AudioSignal

    IN_NOTEBOOK = in_notebook()

    if isinstance(obj, AudioSignal):
        audio_elem = obj.embed(display=False, return_html=True)
        if IN_NOTEBOOK:
            from IPython.display import HTML

            return HTML(audio_elem)
        else:
            print(audio_elem)
    if isinstance(obj, dict):
        table = audio_table(obj, **kwargs)
        if IN_NOTEBOOK:
            from IPython.display import HTML

            return HTML(_markdown_table_to_html(table))
        else:
            print(table)
    if isinstance(obj, plt.Figure):
        plt.show()
