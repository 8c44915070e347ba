PREFIX ex: <http://ex/>
DELETE { ?s ex:name ?n } INSERT { ?s ex:handle ?n } WHERE { ?s ex:name ?n }
