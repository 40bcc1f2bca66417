"""Convert Cityscapes gtFine annotations to COCO json
(ref: tools/convert_datasets/cityscapes.py). Instance polygons come from
the *_gtFine_polygons.json files; the 8 detection classes only."""
import argparse
import glob
import json
import os.path as osp

CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train', 'motorcycle',
           'bicycle')


def convert(gt_dir, img_dir, out_file):
    cat2id = {c: i + 1 for i, c in enumerate(CLASSES)}
    images, annotations = [], []
    aid = 1
    files = sorted(glob.glob(osp.join(gt_dir, '*', '*_polygons.json')))
    for idx, path in enumerate(files, start=1):
        with open(path) as f:
            data = json.load(f)
        city = osp.basename(osp.dirname(path))
        stem = osp.basename(path).replace('_gtFine_polygons.json', '')
        images.append(dict(
            id=idx, width=data['imgWidth'], height=data['imgHeight'],
            file_name=osp.join(city, f'{stem}_leftImg8bit.png')))
        for obj in data['objects']:
            label = obj['label']
            ignore = 0
            if label.endswith('group'):
                label = label[:-len('group')]
                ignore = 1
            if label not in cat2id:
                continue
            xs = [p[0] for p in obj['polygon']]
            ys = [p[1] for p in obj['polygon']]
            x1, y1, x2, y2 = min(xs), min(ys), max(xs), max(ys)
            annotations.append(dict(
                id=aid, image_id=idx, category_id=cat2id[label],
                bbox=[x1, y1, x2 - x1, y2 - y1],
                area=(x2 - x1) * (y2 - y1), iscrowd=ignore,
                segmentation=[sum(([p[0], p[1]] for p in obj['polygon']),
                                  [])]))
            aid += 1
    cats = [dict(id=i + 1, name=c) for i, c in enumerate(CLASSES)]
    with open(out_file, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=cats), f)
    print(f'{len(images)} images, {len(annotations)} anns -> {out_file}')


def main():
    parser = argparse.ArgumentParser(description='cityscapes -> COCO json')
    parser.add_argument('gt_dir', help='gtFine/<split> directory')
    parser.add_argument('img_dir', help='leftImg8bit/<split> directory')
    parser.add_argument('out_file')
    args = parser.parse_args()
    convert(args.gt_dir, args.img_dir, args.out_file)


if __name__ == '__main__':
    main()
