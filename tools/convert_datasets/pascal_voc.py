"""Convert PASCAL VOC XML annotations to COCO json
(ref: tools/convert_datasets/pascal_voc.py)."""
import argparse
import json
import os.path as osp
import xml.etree.ElementTree as ET

VOC_CLASSES = ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
               'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
               'motorbike', 'person', 'pottedplant', 'sheep', 'sofa',
               'train', 'tvmonitor')


def convert(devkit_path, split_file, out_file, year='2007'):
    with open(split_file) as f:
        img_ids = [line.strip() for line in f if line.strip()]
    images, annotations = [], []
    aid = 1
    cat2id = {c: i + 1 for i, c in enumerate(VOC_CLASSES)}
    for idx, img_id in enumerate(img_ids, start=1):
        xml_path = osp.join(devkit_path, f'VOC{year}', 'Annotations',
                            f'{img_id}.xml')
        root = ET.parse(xml_path).getroot()
        size = root.find('size')
        w = int(size.find('width').text)
        h = int(size.find('height').text)
        images.append(dict(id=idx, file_name=f'{img_id}.jpg', width=w,
                           height=h))
        for obj in root.findall('object'):
            name = obj.find('name').text
            if name not in cat2id:
                continue
            bb = obj.find('bndbox')
            x1, y1, x2, y2 = (float(bb.find(t).text)
                              for t in ('xmin', 'ymin', 'xmax', 'ymax'))
            diff = obj.find('difficult')
            annotations.append(dict(
                id=aid, image_id=idx, category_id=cat2id[name],
                bbox=[x1, y1, x2 - x1, y2 - y1],
                area=(x2 - x1) * (y2 - y1),
                iscrowd=0,
                ignore=int(diff.text) if diff is not None else 0))
            aid += 1
    cats = [dict(id=i + 1, name=c) for i, c in enumerate(VOC_CLASSES)]
    with open(out_file, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=cats), f)
    print(f'{len(images)} images, {len(annotations)} anns -> {out_file}')


def main():
    parser = argparse.ArgumentParser(description='VOC -> COCO json')
    parser.add_argument('devkit_path')
    parser.add_argument('split_file')
    parser.add_argument('out_file')
    parser.add_argument('--year', default='2007')
    args = parser.parse_args()
    convert(args.devkit_path, args.split_file, args.out_file, args.year)


if __name__ == '__main__':
    main()
