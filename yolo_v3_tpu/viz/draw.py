"""Visualization: box overlays, image grids, model comparison panels.

Host-side presentation layer (equivalent of reference draw.py:15-127 and the
display entry points in test.py:48-108).  Pure matplotlib/OpenCV on numpy
arrays; nothing here touches the device.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

__all__ = [
    "get_color_palette",
    "draw_labels",
    "show_img_grid",
    "draw_detections_cv2",
    "save_detections_image",
]


def get_color_palette(num_classes: int):
    """Distinct per-class colors from matplotlib's tab20b colormap
    (reference draw.py:110-116)."""
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap("tab20b")
    return [cmap(i / max(num_classes - 1, 1))[:3] for i in range(num_classes)]


def draw_labels(ax, labels: np.ndarray, classes: Optional[Sequence[str]] = None,
                palette=None):
    """Draw [n, >=5] rows [cls, x, y, w, h, (prob ...)] (xywh pixels) onto a
    matplotlib axis with outlined text (reference draw_labels/draw_outline,
    draw.py:15-62)."""
    from matplotlib import patches, patheffects

    if labels is None or len(labels) == 0:
        return
    n_cls = len(classes) if classes else int(max(labels[:, 0].max() + 1, 1))
    palette = palette or get_color_palette(n_cls)
    for row in labels:
        cls = int(row[0])
        x, y, w, h = row[1:5]
        color = palette[cls % len(palette)]
        rect = patches.Rectangle((x, y), w, h, fill=False, edgecolor=color, lw=2)
        rect.set_path_effects([patheffects.Stroke(linewidth=3, foreground="black"),
                               patheffects.Normal()])
        ax.add_patch(rect)
        name = classes[cls] if classes and cls < len(classes) else str(cls)
        if len(row) > 5:
            name = f"{name} {row[5]:.2f}"
        txt = ax.text(x, y, name, color="white", fontsize=9, va="bottom")
        txt.set_path_effects([patheffects.Stroke(linewidth=2, foreground="black"),
                              patheffects.Normal()])


def show_img_grid(
    imgs: Sequence[np.ndarray],
    cols: int = 2,
    classes: Optional[Sequence[str]] = None,
    labels_list: Optional[Sequence[Optional[np.ndarray]]] = None,
    col_title_dict: Optional[Dict] = None,
    save_path: Optional[str] = None,
):
    """Grid of images with optional per-image label overlays and column
    titles (reference show_img_grid, draw.py:65-98)."""
    import matplotlib
    if save_path:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(imgs)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(6 * cols, 5 * rows), squeeze=False)
    palette = get_color_palette(len(classes)) if classes else None
    for i, img in enumerate(imgs):
        ax = axes[i // cols][i % cols]
        if img.dtype != np.uint8 and img.max() <= 1.5:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ax.imshow(img)
        ax.axis("off")
        if labels_list is not None and i < len(labels_list):
            draw_labels(ax, labels_list[i], classes, palette)
        if col_title_dict and i < cols:
            titles = col_title_dict.get("title", [])
            if i < len(titles):
                ax.set_title(
                    titles[i],
                    pad=col_title_dict.get("pad", 10),
                    fontsize=col_title_dict.get("fontsize", 14),
                )
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    else:
        plt.show()
    return fig


def draw_detections_cv2(
    img: np.ndarray,
    detections: np.ndarray,
    classes: Optional[Sequence[str]] = None,
) -> np.ndarray:
    """OpenCV box + text-with-background rendering
    (reference cv2_drawTextWithBkgd, draw.py:118-127).  Returns a copy."""
    import cv2

    out = img.copy()
    if detections is None or len(detections) == 0:
        return out
    n_cls = len(classes) if classes else int(detections[:, 0].max() + 1)
    palette = [(int(r * 255), int(g * 255), int(b * 255))
               for r, g, b in get_color_palette(max(n_cls, 1))]
    for row in detections:
        cls = int(row[0])
        x, y, w, h = [int(v) for v in row[1:5]]
        color = palette[cls % len(palette)]
        cv2.rectangle(out, (x, y), (x + w, y + h), color, 2)
        name = classes[cls] if classes and cls < len(classes) else str(cls)
        if len(row) > 5:
            name = f"{name} {row[5]:.2f}"
        (tw, th), _ = cv2.getTextSize(name, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        cv2.rectangle(out, (x, y - th - 4), (x + tw, y), color, -1)
        cv2.putText(out, name, (x, y - 2), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (255, 255, 255), 1, cv2.LINE_AA)
    return out


def save_detections_image(img, detections, path, classes=None):
    import cv2

    out = draw_detections_cv2(img, detections, classes)
    cv2.imwrite(path, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
